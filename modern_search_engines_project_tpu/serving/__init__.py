from modern_search_engines_project_tpu.serving.api import (
    SearchService,
    extract_domain_topic,
)
from modern_search_engines_project_tpu.serving.assistant import (
    ExtractiveSummarizer,
    HttpLlmClient,
    Summarizer,
)

__all__ = [
    "SearchService",
    "extract_domain_topic",
    "ExtractiveSummarizer",
    "HttpLlmClient",
    "Summarizer",
]
