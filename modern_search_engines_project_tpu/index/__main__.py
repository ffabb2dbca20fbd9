"""Index build CLI (reference ``python index_all.py`` analog).

    python -m modern_search_engines_project_tpu.index \
        --db crawl.sqlite --out index_artifacts \
        [--min-score 0.0] [--shard-size 1024] [--encoder hashing|path]

Builds the hybrid array index (CSR impact postings + chunk-embedding bank)
from a crawl store, sharded and resumable: interrupted builds skip already
built shards on re-run (SURVEY.md §5.4).
"""

from __future__ import annotations

import argparse
import logging
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--db", default="crawl.sqlite")
    parser.add_argument("--out", default="index_artifacts")
    parser.add_argument("--min-score", type=float, default=0.0)
    parser.add_argument("--shard-size", type=int, default=1024)
    parser.add_argument(
        "--encoder",
        default="hashing",
        help="'hashing' or a trained encoder checkpoint dir",
    )
    parser.add_argument("--force", action="store_true",
                        help="rebuild all shards (force_reindex analog)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("index")

    from modern_search_engines_project_tpu.config import DEFAULT_CONFIG
    from modern_search_engines_project_tpu.crawler.storage import CrawlStore
    from modern_search_engines_project_tpu.index.artifacts import save_artifacts
    from modern_search_engines_project_tpu.index.pipeline import BuildPipeline

    cfg = DEFAULT_CONFIG
    if args.encoder == "hashing":
        from modern_search_engines_project_tpu.models import HashingEncoder

        encoder = HashingEncoder(dim=cfg.embedding_dim)
    else:
        from modern_search_engines_project_tpu.models.encoder import JaxEncoder

        # from_checkpoint records ckpt_path so the artifacts' provenance
        # lets serving auto-load the matching query encoder
        encoder = JaxEncoder.from_checkpoint(args.encoder)
        cfg = cfg.replace(embedding_dim=encoder.cfg.dim)

    if args.force:
        import shutil

        shutil.rmtree(args.out, ignore_errors=True)

    store = CrawlStore(args.db)
    docs = list(store.iter_documents(min_score=args.min_score))
    log.info("building index over %d documents", len(docs))
    t0 = time.time()
    pipe = BuildPipeline(
        encoder, args.out, cfg, shard_size=args.shard_size
    )
    art = pipe.build(docs)
    save_artifacts(art, args.out)
    log.info(
        "index built in %.1fs: %s", time.time() - t0, art.index_stats()
    )


if __name__ == "__main__":
    main()
