from semtools_tpu.parallel import multihost
from semtools_tpu.parallel.mesh import corpus_mesh, shard_corpus
from semtools_tpu.parallel.scan import (
    sharded_int8_topk_scan,
    sharded_threshold_scan,
    sharded_topk_scan,
)

__all__ = ["corpus_mesh", "multihost", "shard_corpus", "sharded_int8_topk_scan", "sharded_threshold_scan", "sharded_topk_scan"]
