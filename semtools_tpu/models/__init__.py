from semtools_tpu.models.static_model import StaticModel, load_model
from semtools_tpu.models.tokenizer import HashTokenizer, HFTokenizer

__all__ = ["StaticModel", "load_model", "HashTokenizer", "HFTokenizer"]
