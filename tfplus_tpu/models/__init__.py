from . import bst, common, dcn, deepfm, din, dlrm, flax_adapter, ncf
from .common import (SparseModel, TrainState, init_state, init_state_multi,
                     make_train_step, make_train_step_multi,
                     make_train_step_scan, grow_if_needed)
from .dcn import DCN
from .deepfm import DeepFM, WideDeep
from .bst import BST
from .din import DIN
from .dlrm import DLRM
from .flax_adapter import FlaxSparseModel
from .ncf import NCF
