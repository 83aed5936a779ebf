"""Sparse optimizer row-update rules.

Vectorized re-implementations of the reference's fused CPU optimizer kernels
(``/root/reference/tfplus/kv_variable/kernels/training_ops.cc``, 7.2k LoC of
per-key Eigen loops under locks). Here each rule is a pure function over the
batch of **unique touched rows** ``[N, D]`` plus a single concatenated slot
array ``[N, k*D]`` (the AdamV4 ``m_v_linear`` concat-slot layout generalised to
every optimizer — training_ops.cc:7156-7162 is the precedent); the surrounding
gather/scatter is done once by :mod:`tfplus_tpu.optim.base`, so the whole
update is one fused XLA/Pallas region instead of 7,000 lines of locking.

Math parity notes (all anchors into training_ops.cc):
  * GroupAdam V4  — :6981-7236 (COMPUTE_ADAM :7166-7196): lazy Adam folded
    into an FTRL-style ``linear`` accumulator, l1 soft-threshold, l21 group
    shrink, row blacklisted when the group norm falls below ``l21·√dim``.
  * SparseGroupFtrl — :533-805 (COMPUTE_FTRL :713-752) with optional
    l2_shrinkage.
  * GroupMomentum :2274, GroupAdadelta :2005, AMSGrad :1742, AdaBelief :2982,
    AdaHessian :2529, LAMB :3400, AdaDQH :4348/:4854 — same group-lasso
    template with per-rule ``linear`` increment and denominator.
  * Adagrad :1373-1500, Adam (python wrapper math) adam.py:93-163,
    RAdam rectified_adam.py:195-262.

``Group* == base optimizer when l1=l2=l21=0`` is the reference's own
equivalence gate (README.md:150-158) and is enforced by tests/test_optimizers.
All rules receive a 1-indexed ``step`` and derive ``beta_power = beta**step``,
matching the reference's power accumulators (updated after each apply).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp

Arr = jnp.ndarray
_TINY = 1e-30


def _norm(x: Arr, axis_name: Optional[str] = None) -> Arr:
    s = jnp.sum(x * x, axis=-1)
    if axis_name is not None:
        # dim-sharded rows (2D table sharding): the group norm spans every
        # column shard — reduce the squared partials over the col axis
        import jax
        s = jax.lax.psum(s, axis_name)
    return jnp.sqrt(s)


def _group_lasso_solve(linear: Arr, y: Arr, l1, l2, l21, dim: int,
                       norm_axis: Optional[str] = None) -> Tuple[Arr, Arr]:
    """Shared closed-form group-lasso solve (training_ops.cc:1301-1317).

    ``y`` is the per-element curvature denominator WITHOUT the ``2*l2`` term.
    Returns ``(var, blacklist_mask)``; blacklisted rows are zero.
    ``norm_axis``: mesh axis holding column shards of the row (2D sharding)
    — the l21 threshold then uses the GLOBAL dim and a psum'd norm, so all
    column shards make the identical keep/blacklist decision.
    """
    if norm_axis is not None:
        import jax
        dim = dim * jax.lax.psum(1, norm_axis)
    adj = jnp.clip(linear, -l1, l1)
    l1_linear = adj - linear
    nrm = _norm(l1_linear, norm_axis)
    l21n = l21 * jnp.sqrt(jnp.asarray(dim, linear.dtype))
    keep = nrm > l21n
    scale = 1.0 - l21n / jnp.maximum(nrm, _TINY)
    var = l1_linear * scale[:, None] / (y + 2.0 * l2)
    var = jnp.where(keep[:, None], var, jnp.zeros_like(var))
    return var, ~keep


def _split(state: Arr, k: int) -> list:
    d = state.shape[-1] // k
    return [state[..., i * d:(i + 1) * d] for i in range(k)]


def _const_base_pow(base, t):
    """``base ** t`` for a CONCRETE scalar base and traced exponent ``t``,
    as ``exp(t·ln base)``. Mosaic (the Pallas TPU compiler) cannot legalize
    ``math.powf`` with a non-constant exponent, so ``beta ** step`` must not
    reach the scan-update kernel as a power op; ``exp`` lowers fine. Betas
    are in (0, 1) in every rule; 1 and ≤0 are handled exactly/for safety."""
    b = float(base)
    if b == 1.0:
        return jnp.ones_like(t)
    if b <= 0.0:                       # not reachable from the shipped rules
        return jnp.asarray(b, t.dtype) ** t
    return jnp.exp(t * t.dtype.type(math.log(b)))


def _powers(beta1, beta2, step, dtype):
    t = step.astype(dtype) if hasattr(step, "astype") else jnp.asarray(step, dtype)
    return _const_base_pow(beta1, t), _const_base_pow(beta2, t)


class Rule:
    """Base: ``slot_width`` concat-slot multiplier k; state is [N, k*D]."""
    slot_width: int = 0
    #: rules that blacklist rows (group-lasso family)
    has_blacklist: bool = False
    #: rules that need an extra per-row input (e.g. AdaHessian's hessian)
    needs_extra: bool = False

    def update(self, var: Arr, state: Arr, grad: Arr, *, lr, step,
               extra: Optional[Arr] = None) -> Tuple[Arr, Arr, Optional[Arr]]:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Sgd(Rule):
    """Plain scatter-sub of lr*grad (gradient_descent.py:24-31)."""
    slot_width = 0

    def update(self, var, state, grad, *, lr, step, extra=None):
        return var - lr * grad, state, None


@dataclasses.dataclass(frozen=True)
class Adagrad(Rule):
    """accum += g²; var -= lr·g/√accum (training_ops.cc:1455-1485).

    The slot stores ``accum - initial_accumulator_value`` so zero-initialised
    slot arrays reproduce the reference's non-zero slot init.
    """
    initial_accumulator_value: float = 0.1
    slot_width = 1

    def update(self, var, state, grad, *, lr, step, extra=None):
        accum = state + self.initial_accumulator_value + grad * grad
        var = var - lr * grad / jnp.sqrt(accum)
        return var, accum - self.initial_accumulator_value, None


@dataclasses.dataclass(frozen=True)
class Adam(Rule):
    """Lazy Adam on touched rows, fused m|v slot (adam.py:93-163, version 2)."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    slot_width = 2

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, v = _split(state, 2)
        b1p, b2p = _powers(self.beta1, self.beta2, step, var.dtype)
        m = self.beta1 * m + (1.0 - self.beta1) * grad
        v = self.beta2 * v + (1.0 - self.beta2) * grad * grad
        lr_t = lr * jnp.sqrt(1.0 - b2p) / (1.0 - b1p)
        var = var - lr_t * m / (self.epsilon + jnp.sqrt(v))
        return var, jnp.concatenate([m, v], axis=-1), None


@dataclasses.dataclass(frozen=True)
class GroupAdam(Rule):
    """GroupAdam V4 — flagship group-lasso Adam (training_ops.cc:6981-7236).

    Slot layout m|v|linear. l1/l2/l21 are scaled by lr inside, matching
    :7113-7115. arXiv:2107.14432 is the algorithm paper.
    """
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 3
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, v, linear = _split(state, 3)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        l1 = self.l1 * lr
        l2 = self.l2 * lr
        l21 = self.l21 * lr
        alpha = lr * jnp.sqrt(1.0 - b2p) / (1.0 - b1p)

        m = self.beta1 * m + (1.0 - self.beta1) * grad
        new_v = self.beta2 * v + (1.0 - self.beta2) * grad * grad
        nvs = jnp.sqrt(new_v)
        # step 1 (beta1 <= beta1_power): sigma = nvs + eps; else Δ√v
        first = jnp.asarray(step, jnp.int32) <= 1
        sigma = jnp.where(first, nvs + self.epsilon, nvs - jnp.sqrt(v))
        linear = linear + alpha * m - sigma * var
        y = nvs + self.epsilon
        new_var, black = _group_lasso_solve(linear, y, l1, l2, l21,
                                            var.shape[-1],
                                            norm_axis=self.norm_axis)
        return new_var, jnp.concatenate([m, new_v, linear], axis=-1), black


@dataclasses.dataclass(frozen=True)
class GroupAdamV1(Rule):
    """GroupAdam VERSION 1 (GroupSparseApplyAdamOp, training_ops.cc:1065,
    COMPUTE_ADAM :1283-1326): the legacy form with BIAS-CORRECTED second
    moment kept in its own ``accum`` slot (new_accum = v/(1−β2^t)),
    ``m/(1−β1^t)`` momentum, ε/√(1−β2^t) epsilon adjust, and UNSCALED
    l1/l2/l21. Slot layout m|v|accum|linear. Versions 2/3/4 share the
    lr-prescaled single-pass math (rules.GroupAdam); version 1 follows a
    genuinely different trajectory."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    initial_accumulator_value: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 4
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, v, accum0, linear = _split(state, 4)
        # v1 is the only version whose accum slot seeds from
        # initial_accumulator_value (group_adam.py:157-170); the slot
        # stores accum − iav so zero-initialised slots reproduce it
        accum = accum0 + self.initial_accumulator_value
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        m = self.beta1 * m + (1.0 - self.beta1) * grad
        v = self.beta2 * v + (1.0 - self.beta2) * grad * grad
        new_accum = v / (1.0 - b2p)
        eps_adj = self.epsilon / jnp.sqrt(1.0 - b2p)
        first = jnp.asarray(step, jnp.int32) <= 1
        delta = jnp.sqrt(new_accum) - jnp.sqrt(accum)
        delta = jnp.where(first, delta + eps_adj, delta)
        linear = linear + m / (1.0 - b1p) - delta / lr * var
        y = (jnp.sqrt(new_accum) + eps_adj) / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate(
            [m, v, new_accum - self.initial_accumulator_value, linear],
            axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class GroupFtrl(Rule):
    """SparseGroupFtrl (+l2_shrinkage variant) — training_ops.cc:533-805.

    Slot layout accum|linear; the slot stores ``accum - initial_accum``.
    """
    lr_power: float = -0.5
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    l2_shrinkage: float = 0.0
    initial_accumulator_value: float = 0.1
    slot_width = 2
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        accum0, linear = _split(state, 2)
        accum = accum0 + self.initial_accumulator_value
        g = grad
        if self.l2_shrinkage:
            g = grad + 2.0 * self.l2_shrinkage * var
        new_accum = accum + g * g
        if self.lr_power == -0.5:
            pw_new, pw_old = jnp.sqrt(new_accum), jnp.sqrt(accum)
        elif self.lr_power == 0.0:
            # x**0 == 1 exactly (exp(0·log 0) would be NaN at accum==0,
            # reachable with initial_accumulator_value=0 and a zero grad)
            pw_new = jnp.ones_like(new_accum)
            pw_old = jnp.ones_like(accum)
        else:
            # traced base, concrete exponent: exp(p·ln x) — math.powf does
            # not legalize in Mosaic (see _const_base_pow). accum==0 is
            # possible at initial_accumulator_value=0: clamp to _TINY so
            # log stays finite (0**p for p>0 then rounds to ~0, matching
            # the reference's Eigen pow)
            p = -float(self.lr_power)
            pw_new = jnp.exp(p * jnp.log(jnp.maximum(new_accum, _TINY)))
            pw_old = jnp.exp(p * jnp.log(jnp.maximum(accum, _TINY)))
        linear = linear + g - (pw_new - pw_old) / lr * var
        y = pw_new / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate(
            [new_accum - self.initial_accumulator_value, linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class GroupMomentum(Rule):
    """GroupSparseApplyMomentum (training_ops.cc:2274, COMPUTE_MOMENTUM
    :2451-2462). Slot layout m|accum|linear; accum is the 0→1 latch that makes
    the first step subtract var/lr."""
    momentum: float = 0.9
    use_nesterov: bool = False
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 3
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, accum, linear = _split(state, 3)
        m = m * self.momentum + grad
        new_m = m * self.momentum + grad if self.use_nesterov else m
        linear = linear + new_m - (1.0 - jnp.sqrt(accum)) / lr * var
        y = 1.0 / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate([m, jnp.ones_like(accum), linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class GroupAdadelta(Rule):
    """GroupSparseApplyAdadelta (training_ops.cc:2005, COMPUTE_ADADELTA).
    Slot layout accum|accum_update|linear."""
    rho: float = 0.95
    epsilon: float = 1e-8
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 3
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        accum, accum_update, linear = _split(state, 3)
        new_accum = accum * self.rho + (1.0 - self.rho) * grad * grad
        m = jnp.sqrt(accum_update + self.epsilon) * grad
        linear = linear + m - (jnp.sqrt(new_accum) - jnp.sqrt(accum)) / lr * var
        y = jnp.sqrt(new_accum + self.epsilon) / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        accum_update = (accum_update * self.rho +
                        (1.0 - self.rho) * m * m / (new_accum + self.epsilon))
        state = jnp.concatenate([new_accum, accum_update, linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class GroupAMSGrad(Rule):
    """GroupSparseApplyAMSGrad (training_ops.cc:1523, COMPUTE_AMSGrad :1742).
    Slot layout m|v|vhat|linear."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 4
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, v, vhat, linear = _split(state, 4)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        m = self.beta1 * m + (1.0 - self.beta1) * grad
        v = self.beta2 * v + (1.0 - self.beta2) * grad * grad
        new_vhat = jnp.maximum(vhat, v / (1.0 - b2p))
        linear = (linear + m / (1.0 - b1p)
                  - (jnp.sqrt(new_vhat) - jnp.sqrt(vhat)) / lr * var)
        y = (jnp.sqrt(new_vhat) + self.epsilon) / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate([m, v, new_vhat, linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class GroupAdaBelief(Rule):
    """GroupSparseApplyAdaBelief (training_ops.cc:2982, COMPUTE_ADABELIEF).
    Slot layout m|v|accum|linear; v tracks (g-m)² belief."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 4
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, v, accum, linear = _split(state, 4)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        m = self.beta1 * m + (1.0 - self.beta1) * grad
        v = self.beta2 * v + (1.0 - self.beta2) * (grad - m) ** 2
        new_accum = v / (1.0 - b2p)
        linear = (linear + m / (1.0 - b1p)
                  - (jnp.sqrt(new_accum) - jnp.sqrt(accum)) / lr * var)
        y = (jnp.sqrt(new_accum) + self.epsilon) / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate([m, v, new_accum, linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class GroupAdaHessian(Rule):
    """GroupSparseApplyAdaHessian (training_ops.cc:2529, COMPUTE_ADAHESSIAN).
    Slot layout m|v|accum|linear; ``extra`` is the per-row Hutchinson diagonal
    Hessian estimate (v tracks hessian²)."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 4
    has_blacklist = True
    needs_extra = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        hessian = grad if extra is None else extra
        m, v, accum, linear = _split(state, 4)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        m = self.beta1 * m + (1.0 - self.beta1) * grad
        v = self.beta2 * v + (1.0 - self.beta2) * hessian * hessian
        new_accum = v / (1.0 - b2p)
        linear = (linear + m / (1.0 - b1p)
                  - (jnp.sqrt(new_accum) - jnp.sqrt(accum)) / lr * var)
        y = (jnp.sqrt(new_accum) + self.epsilon) / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate([m, v, new_accum, linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class GroupLamb(Rule):
    """GroupSparseApplyLamb (training_ops.cc:3400, COMPUTE_LAMB). Slot layout
    m|v|accum|linear; trust ratio ‖var‖/‖r‖ scales the momentum term."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-6
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 4
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, v, accum, linear = _split(state, 4)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        m = self.beta1 * m + (1.0 - self.beta1) * grad
        v = self.beta2 * v + (1.0 - self.beta2) * grad * grad
        new_m = m / (1.0 - b1p)
        new_accum = v / (1.0 - b2p)
        r = new_m / (jnp.sqrt(new_accum) + self.epsilon)
        r_norm = _norm(r)
        var_norm = _norm(var)
        ratio = jnp.where((r_norm > 0) & (var_norm > 0),
                          var_norm / (r_norm + 1e-8), 1.0)
        linear = (linear + new_m * ratio[:, None]
                  - (jnp.sqrt(new_accum) - jnp.sqrt(accum)) / lr * var)
        y = (jnp.sqrt(new_accum) + self.epsilon) / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate([m, v, new_accum, linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class GroupLambHessian(Rule):
    """GroupSparseApplyLambHessian (training_ops.cc:3866,
    COMPUTE_LAMBHESSIAN :4095-4135): the LAMB trust-ratio group update
    whose second moment tracks the Hutchinson diagonal Hessian estimate
    (``extra``) instead of g². Slot layout m|v|accum|linear. Unlike
    GroupAdam V4, l1/l2/l21 are NOT lr-scaled (matches the kernel)."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-6
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 4
    has_blacklist = True
    needs_extra = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        hessian = grad if extra is None else extra
        m, v, accum, linear = _split(state, 4)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        m = self.beta1 * m + (1.0 - self.beta1) * grad
        v = self.beta2 * v + (1.0 - self.beta2) * hessian * hessian
        new_m = m / (1.0 - b1p)
        new_accum = v / (1.0 - b2p)
        r = new_m / (jnp.sqrt(new_accum) + self.epsilon)
        r_norm = _norm(r)
        var_norm = _norm(var)
        ratio = jnp.where((r_norm > 0) & (var_norm > 0),
                          var_norm / (r_norm + 1e-8), 1.0)
        linear = (linear + new_m * ratio[:, None]
                  - (jnp.sqrt(new_accum) - jnp.sqrt(accum)) / lr * var)
        y = (jnp.sqrt(new_accum) + self.epsilon) / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate([m, v, new_accum, linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class LambHessian(Rule):
    """Dense ApplyLambHessian functor (training_ops.cc:4186-4218): direct
    trust-ratio update, no linear accumulator / group lasso. Slot layout
    m|v; ``extra`` is the diagonal Hessian estimate."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-6
    slot_width = 2
    needs_extra = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        hessian = grad if extra is None else extra
        m, v = _split(state, 2)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        adjust = jnp.sqrt(1.0 - b2p) / (1.0 - b1p)
        m = m + (grad - m) * (1.0 - self.beta1)
        v = v + (hessian * hessian - v) * (1.0 - self.beta2)
        denom = jnp.sqrt(v) + self.epsilon
        r = m * adjust / denom
        r_norm = _norm(r)
        var_norm = _norm(var)
        ratio = jnp.where((r_norm > 0) & (var_norm > 0),
                          var_norm / (r_norm + 1e-8), 1.0)
        var = var - m * lr * adjust * ratio[:, None] / denom
        return var, jnp.concatenate([m, v], axis=-1), None


@dataclasses.dataclass(frozen=True)
class AdaDQH(Rule):
    """In-house AdaDQH, non-group sparse form (training_ops.cc:4348-4374
    functor; KvVariableSparseApplyAdaDQH :4463). Slot layout m|v; the second
    moment tracks the quasi-hyperbolic h = m_new/(1-b1p) - m_old/β."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-5
    slot_width = 2

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, v = _split(state, 2)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        alpha = lr * jnp.sqrt(1.0 - b2p) / (1.0 - b1p)
        first = jnp.asarray(step, jnp.int32) <= 1
        beta = jnp.where(first, 1.0, 1.0 - b1p / self.beta1).astype(dt)
        m_old = m / beta
        m_new = self.beta1 * m + (1.0 - self.beta1) * grad
        h = m_new / (1.0 - b1p) - m_old
        v = self.beta2 * v + (1.0 - self.beta2) * h * h
        denom = jnp.maximum(jnp.sqrt(v), self.epsilon * jnp.sqrt(1.0 - b2p))
        var = var - m_new * alpha / denom
        return var, jnp.concatenate([m_new, v], axis=-1), None


@dataclasses.dataclass(frozen=True)
class GroupAdaDQH(Rule):
    """GroupSparseApplyAdaDQH**V2** (training_ops.cc:5139; COMPUTE_ADADQH
    macro :5344-5385). Slot layout m|v|linear.

    V2's distinguishing features vs V1 (:4854, rules.GroupAdaDQHV1):
    the linear accumulator is kept in lr-PRE-SCALED units (alpha carries
    lr, the Δaccum·var term has no /lr, l1/l2/l21 are multiplied by lr —
    :5295-5300), and the OLD accumulator's epsilon floor uses the PREVIOUS
    step's adjust ``ε·√(1−β2^(t−1))`` (``last_epsilon_adjust`` :5302-5304),
    which is exactly the floor that was applied to it as ``accum_new`` last
    step — self-consistent across steps."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-5
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 3
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, v, linear = _split(state, 3)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        alpha = lr * jnp.sqrt(1.0 - b2p) / (1.0 - b1p)
        eps_adj = self.epsilon * jnp.sqrt(1.0 - b2p)
        # ε·√(1 − β2^(t−1)): zero at t=1 (β2^0 = 1), matching the kernel's
        # beta2_power/beta2 division
        last_eps_adj = self.epsilon * jnp.sqrt(
            jnp.maximum(1.0 - b2p / self.beta2, 0.0))
        first = jnp.asarray(step, jnp.int32) <= 1
        beta = jnp.where(first, 1.0, 1.0 - b1p / self.beta1).astype(dt)
        m_old = m / beta
        m_new = self.beta1 * m + (1.0 - self.beta1) * grad
        h = m_new / (1.0 - b1p) - m_old
        v_new = self.beta2 * v + (1.0 - self.beta2) * h * h
        accum_new = jnp.maximum(jnp.sqrt(v_new), eps_adj)
        accum_old = jnp.maximum(jnp.sqrt(v), last_eps_adj)
        linear = linear + m_new * alpha - (accum_new - accum_old) * var
        y = accum_new
        new_var, black = _group_lasso_solve(linear, y, self.l1 * lr,
                                            self.l2 * lr, self.l21 * lr,
                                            var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate([m_new, v_new, linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class GroupAdaDQHV1(Rule):
    """GroupSparseApplyAdaDQH VERSION 1 (training_ops.cc:4854-5138;
    COMPUTE_ADADQH macro :5045-5095) — the legacy trajectory. Differences
    vs V2 (rules.GroupAdaDQH): the linear accumulator is in UNSCALED units
    (alpha has no lr, the Δaccum·var term divides by lr, l1/l2/l21 enter
    the solve raw, y = accum_new/lr + 2·l2), and the old accumulator's
    epsilon floor ``gamma`` uses the CURRENT step's ε·√(1−β2^t) (0 at the
    first step — :5053-5061). Slot layout m|v|linear."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-5
    l1: float = 0.0
    l2: float = 0.0
    l21: float = 0.0
    norm_axis: Optional[str] = None
    slot_width = 3
    has_blacklist = True

    def update(self, var, state, grad, *, lr, step, extra=None):
        m, v, linear = _split(state, 3)
        dt = var.dtype
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        alpha = jnp.sqrt(1.0 - b2p) / (1.0 - b1p)
        eps_adj = self.epsilon * jnp.sqrt(1.0 - b2p)
        first = jnp.asarray(step, jnp.int32) <= 1
        beta = jnp.where(first, 1.0, 1.0 - b1p / self.beta1).astype(dt)
        gamma = jnp.where(first, 0.0, eps_adj).astype(dt)
        m_old = m / beta
        m_new = self.beta1 * m + (1.0 - self.beta1) * grad
        h = m_new / (1.0 - b1p) - m_old
        v_new = self.beta2 * v + (1.0 - self.beta2) * h * h
        linear = (linear + m_new * alpha
                  - (jnp.maximum(jnp.sqrt(v_new), eps_adj)
                     - jnp.maximum(jnp.sqrt(v), gamma)) / lr * var)
        y = jnp.maximum(jnp.sqrt(v_new), eps_adj) / lr
        new_var, black = _group_lasso_solve(linear, y, self.l1, self.l2,
                                            self.l21, var.shape[-1],
                                            norm_axis=self.norm_axis)
        state = jnp.concatenate([m_new, v_new, linear], axis=-1)
        return new_var, state, black


@dataclasses.dataclass(frozen=True)
class RAdam(Rule):
    """Rectified Adam (rectified_adam.py:195-262): variance rectification with
    SMA threshold, optional amsgrad + warmup + weight decay. Slot layout m|v
    (|vhat when amsgrad)."""
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-7
    weight_decay: float = 0.0
    amsgrad: bool = False
    sma_threshold: float = 5.0
    total_steps: int = 0
    warmup_proportion: float = 0.1
    min_lr: float = 0.0

    @property
    def slot_width(self):
        return 3 if self.amsgrad else 2

    def update(self, var, state, grad, *, lr, step, extra=None):
        dt = var.dtype
        t = jnp.asarray(step, dt)
        if self.total_steps > 0:
            warmup_steps = self.total_steps * self.warmup_proportion
            decay_steps = max(self.total_steps - warmup_steps, 1.0)
            decay_rate = (self.min_lr - lr) / decay_steps
            lr = jnp.where(t <= warmup_steps,
                           lr * (t / warmup_steps),
                           lr + decay_rate * jnp.minimum(t - warmup_steps,
                                                         decay_steps))
        b1p, b2p = _powers(self.beta1, self.beta2, step, dt)
        if self.amsgrad:
            m, v, vhat = _split(state, 3)
        else:
            m, v = _split(state, 2)
            vhat = None
        m = self.beta1 * m + (1.0 - self.beta1) * grad
        v = self.beta2 * v + (1.0 - self.beta2) * grad * grad
        sma_inf = 2.0 / (1.0 - self.beta2) - 1.0
        sma_t = sma_inf - 2.0 * t * b2p / (1.0 - b2p)
        m_corr = m / (1.0 - b1p)
        if self.amsgrad:
            vhat = jnp.maximum(vhat, v)
            v_corr = jnp.sqrt(vhat / (1.0 - b2p))
        else:
            v_corr = jnp.sqrt(v / (1.0 - b2p))
        r_t = jnp.sqrt((sma_t - 4.0) / (sma_inf - 4.0)
                       * (sma_t - 2.0) / (sma_inf - 2.0)
                       * sma_inf / jnp.maximum(sma_t, _TINY))
        var_t = jnp.where(sma_t >= self.sma_threshold,
                          r_t * m_corr / (v_corr + self.epsilon), m_corr)
        if self.weight_decay:
            var_t = var_t + self.weight_decay * var
        var = var - lr * var_t
        parts = [m, v] + ([vhat] if self.amsgrad else [])
        return var, jnp.concatenate(parts, axis=-1), None


# ---------------------------------------------------------------------------
# AdaDQH hypergradient compute ops — read-only functions over optimizer state
# that produce per-element hypergradients of (lr, epsilon) for AdaDQH's
# hyperparameter adaptation loop (reference ComputeAdaDQHHG functor
# training_ops.cc:6556-6588; KvVariableComputeGroupAdaDQHHP/ComputeAdaDQHHG
# ops :6317-6553; op defs ops/training_ops.cc:1107-1193).
# ---------------------------------------------------------------------------

def _prev_powers(beta1, beta2, step, dtype):
    """β^(step−1): the kernels divide the passed power accumulators by β
    (``1 − beta2_power/beta2``), i.e. they bias-correct with the PREVIOUS
    step's powers — ``step`` here is the upcoming 1-indexed step."""
    t = jnp.asarray(step, dtype) - 1.0
    return _const_base_pow(beta1, t), _const_base_pow(beta2, t)


def adadqh_hg(m: Arr, v: Arr, *, lr, step, beta1=0.9, beta2=0.999,
              epsilon=1e-5, sam: bool = False, delta: Optional[Arr] = None,
              alpha=1.0) -> Tuple[Arr, Arr]:
    """ComputeAdaDQHHG (training_ops.cc:6556-6588): hypergradients of
    ``(lr, epsilon)`` from AdaDQH's first/second-moment state. The op's
    var/grad inputs are unused by the functor; ``sam`` adds the SAM
    perturbation term ``−(1−α)·delta`` to the lr hypergradient."""
    dt = m.dtype
    b1p, b2p = _prev_powers(beta1, beta2, step, dt)
    adjust = jnp.sqrt(1.0 - b2p) / (1.0 - b1p)
    eps_adj = epsilon * jnp.sqrt(1.0 - b2p)
    sq = jnp.sqrt(v)
    deno = jnp.maximum(sq, eps_adj)
    ind = (eps_adj >= sq).astype(dt)
    lr_hg = -adjust * m / deno
    eps_hg = lr * adjust * m / (deno * deno) * ind
    if sam and delta is not None:
        lr_hg = lr_hg - (1.0 - alpha) * delta
    return lr_hg, eps_hg


def group_adadqh_hp(linear: Arr, v: Arr, *, lr, step, beta2=0.999,
                    epsilon=1e-5, l1=0.0, l2=0.0, l21=0.0,
                    dim: Optional[int] = None) -> Tuple[Arr, Arr]:
    """KvVariableComputeGroupAdaDQHHP (training_ops.cc:6317-6530,
    COMPUTE_GROUPADADQHHG macro :6497-6521): hypergradients of
    ``(lr, epsilon)`` through the group-lasso closed-form solve — rows whose
    soft-thresholded group norm falls below ``l21·√dim`` get zeros."""
    dt = linear.dtype
    d = linear.shape[-1] if dim is None else dim
    _, b2p = _prev_powers(beta2, beta2, step, dt)
    root = jnp.sqrt(1.0 - b2p)
    eps_adj = epsilon * root
    adj = jnp.clip(linear, -l1, l1)
    l1_linear = adj - linear
    nrm = _norm(l1_linear)
    l21n = l21 * jnp.sqrt(jnp.asarray(d, dt))
    keep = (nrm > l21n)[:, None]
    scale = (1.0 - l21n / jnp.maximum(nrm, _TINY))[:, None]
    sq = jnp.sqrt(v)
    y = jnp.maximum(sq, eps_adj)
    deno = (y + 2.0 * l2 * lr) ** 2
    ind = (eps_adj >= sq).astype(dt)
    lr_hg = jnp.where(keep, y / deno * scale * l1_linear,
                      jnp.zeros_like(linear))
    eps_hg = jnp.where(keep, -lr * root / y * ind * scale * l1_linear,
                       jnp.zeros_like(linear))
    return lr_hg, eps_hg


def Momentum(momentum=0.9, use_nesterov=False):
    """Plain momentum = GroupMomentum with zero regularisation
    (reference registers only the Group kernel; README.md:150-158)."""
    return GroupMomentum(momentum=momentum, use_nesterov=use_nesterov)


def Adadelta(rho=0.95, epsilon=1e-8):
    return GroupAdadelta(rho=rho, epsilon=epsilon)


ALL_RULES = {
    "sgd": Sgd,
    "adagrad": Adagrad,
    "adam": Adam,
    "group_adam": GroupAdam,
    "group_adam_v1": GroupAdamV1,
    "group_ftrl": GroupFtrl,
    "ftrl": GroupFtrl,
    "group_momentum": GroupMomentum,
    "group_adadelta": GroupAdadelta,
    "group_amsgrad": GroupAMSGrad,
    "group_adabelief": GroupAdaBelief,
    "group_adahessian": GroupAdaHessian,
    "group_lamb": GroupLamb,
    "group_lamb_hessian": GroupLambHessian,
    "lamb_hessian": LambHessian,
    "adadqh": AdaDQH,
    "group_adadqh": GroupAdaDQH,
    "radam": RAdam,
}
