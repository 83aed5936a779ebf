from . import common, dcn, dlrm, ncf
from .common import (SparseModel, TrainState, init_state, init_state_multi,
                     make_train_step, make_train_step_multi, grow_if_needed)
from .dcn import DCN
from .dlrm import DLRM
from .ncf import NCF
