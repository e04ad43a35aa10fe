from semtools_tpu.ops.embed import embed_token_lists
from semtools_tpu.ops.scan import cosine_distances, topk_scan

__all__ = ["embed_token_lists", "cosine_distances", "topk_scan"]
