from modern_search_engines_project_tpu.models.hash_encoder import HashingEncoder

__all__ = ["HashingEncoder"]
