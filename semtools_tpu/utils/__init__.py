from semtools_tpu.utils.hashing import fnv1a_64
