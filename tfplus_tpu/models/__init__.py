from . import common, dcn, dlrm, ncf
from .common import SparseModel, TrainState, init_state, make_train_step, grow_if_needed
from .dcn import DCN
from .dlrm import DLRM
from .ncf import NCF
