"""tfplus_tpu — a TPU-native sparse-embedding training framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
intelligent-machine-learning/tfplus (Ant Group's KvVariable stack for
ultra-large-scale sparse CTR training): dynamically-growing key→row embedding
tables in HBM, fused sparse optimizers (Adam/Adagrad/GroupAdam/SparseGroupFtrl
and the AdaDQH/AdaHessian/AdaBelief/LAMB family), full + incremental (delta)
checkpointing with elastic repartition-on-restore, sharded embedding lookup
over a device mesh, and Pallas flash attention.

See SURVEY.md for the structural map of the reference and the design
translation table (§7.0).
"""
from . import checkpoint, config, data, embedding, io, kv, models, nn, optim
from . import parallel, serving, train, variables
from .variables import (get_kv_variable, get_kv_feature_size,
                        fixed_size_partitioner,
                        set_tfplus_saver_mode, tfplus_saver_mode,
                        KvVariableStore, default_store)
from .version import __version__
