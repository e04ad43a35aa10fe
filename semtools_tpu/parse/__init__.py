from semtools_tpu.parse.backend import LlamaParseBackend, ParseResult
from semtools_tpu.parse.cache import CacheManager
from semtools_tpu.parse.config import LlamaParseConfig, load_parse_config
from semtools_tpu.parse.client import JobError, ParseClient
from semtools_tpu.parse.local_backend import LocalParseBackend, LocalParseError

__all__ = [
    "LlamaParseBackend",
    "LocalParseBackend",
    "LocalParseError",
    "ParseResult",
    "CacheManager",
    "LlamaParseConfig",
    "load_parse_config",
    "ParseClient",
    "JobError",
]
