from . import bundle, repartition, tf_export, tf_import
from .bundle import BundleReader, BundleWriter
from .manager import CheckpointManager
from .saver import (FIRST_N_DELTA, FIRST_N_INFERENCE, FIRST_N_KV,
                    FIRST_N_TRAIN, AsyncSave, UnionReader, restore,
                    restore_multihost, restore_table, save, save_async,
                    save_multihost, save_table)
