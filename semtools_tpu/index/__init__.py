from semtools_tpu.index.kmeans import kmeans_fit, kmeans_step, sharded_kmeans_step
from semtools_tpu.index.pq import PQCodebook, adc_scan, pq_encode, pq_fit
from semtools_tpu.index.ivf_pq import IvfPqIndex

__all__ = [
    "kmeans_fit",
    "kmeans_step",
    "sharded_kmeans_step",
    "PQCodebook",
    "pq_fit",
    "pq_encode",
    "adc_scan",
    "IvfPqIndex",
]
