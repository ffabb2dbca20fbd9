from modern_search_engines_project_tpu.index.builder import (
    Document,
    IndexArtifacts,
    IndexBuilder,
    extract_domain,
    make_snippet,
)
from modern_search_engines_project_tpu.index.artifacts import (
    load_artifacts,
    save_artifacts,
)
from modern_search_engines_project_tpu.index.vocab import TermDictionary

__all__ = [
    "Document",
    "IndexArtifacts",
    "IndexBuilder",
    "TermDictionary",
    "extract_domain",
    "make_snippet",
    "load_artifacts",
    "save_artifacts",
]
