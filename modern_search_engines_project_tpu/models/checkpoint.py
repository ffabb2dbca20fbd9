"""Model checkpointing: params + config save/restore.

Array-native analog of the reference's trained-model publishing
(``embedder_training/train.py:115`` saves a SentenceTransformer dir):
flax msgpack bytes + a JSON config sidecar, atomic rename.  Training jobs
checkpoint every N steps and resume from the latest (SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
from typing import Optional, Tuple

from flax import serialization

from modern_search_engines_project_tpu.models.encoder import EncoderConfig


def save_encoder(
    params, enc_cfg: EncoderConfig, path: str, dtype: Optional[str] = None
) -> None:
    """``dtype="float16"`` halves the on-disk checkpoint (the flagship
    12L/768d is ~500 MB in f32 — too heavy to version); load_encoder
    restores to f32.  Evaluate the RELOADED encoder when publishing
    numbers so they describe the committed artifact."""
    if dtype is not None:
        import jax
        import numpy as np

        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(dtype), params
        )
    os.makedirs(path, exist_ok=True)
    blob = serialization.to_bytes(params)
    fd, tmp = tempfile.mkstemp(dir=path)
    with os.fdopen(fd, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(path, "params.msgpack"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(enc_cfg), f)


def load_encoder(path: str, template_params=None) -> Tuple[object, EncoderConfig]:
    with open(os.path.join(path, "config.json")) as f:
        enc_cfg = EncoderConfig(**json.load(f))
    if template_params is None:
        import jax
        import jax.numpy as jnp

        from modern_search_engines_project_tpu.models.encoder import BiEncoder

        model = BiEncoder(enc_cfg)
        ids = jnp.zeros((1, enc_cfg.max_len), jnp.int32)
        mask = jnp.ones((1, enc_cfg.max_len), jnp.int32)
        template_params = model.init(jax.random.key(0), ids, mask)["params"]
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(template_params, f.read())
    # half-precision checkpoints restore to f32 for serving math
    import jax
    import numpy as np

    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(np.float32)
        if getattr(x, "dtype", None) == np.float16
        else x,
        params,
    )
    return params, enc_cfg


def latest_step_dir(root: str) -> Optional[str]:
    if not os.path.isdir(root):
        return None
    steps = [
        d for d in os.listdir(root)
        if d.startswith("step_") and d[5:].isdigit()
    ]
    if not steps:
        return None
    return os.path.join(root, max(steps, key=lambda d: int(d[5:])))
