from modern_search_engines_project_tpu.text.analyzer import Analyzer, normalize_text
from modern_search_engines_project_tpu.text.chunker import create_sliding_windows
from modern_search_engines_project_tpu.text.hash_tokenizer import HashTokenizer

__all__ = ["Analyzer", "normalize_text", "create_sliding_windows", "HashTokenizer"]
