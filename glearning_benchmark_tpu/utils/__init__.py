from .hashing import stable_hash, stable_token_hash
from .config import load_config, deep_get

__all__ = ["stable_hash", "stable_token_hash", "load_config", "deep_get"]
