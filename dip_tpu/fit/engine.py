"""The DIP optimization engine: one jitted lax.scan per fit.

TPU-native redesign of the reference's optimize() driver + notebook closure
protocol (/root/reference/utils/common_utils.py:198-232 and e.g.
denoising.ipynb cell 10).  The reference runs a Python loop that syncs
GPU->CPU every iteration for PSNR logging and stashes all params to host for
backtracking; here the entire loop body — input jitter, optional weight
jitter, forward, loss, grads, optimizer update, EMA smoothing, on-device
PSNR, snapshot/backtracking — is a pure function scanned on device.  Host
contact happens only at `log_every` chunk boundaries.

Semantics preserved from the reference:
 - input jitter: z_used = z_saved + N(0,1)*reg_noise_std each iteration
 - weight jitter (param_noise): conv kernels perturbed by N(0,1)*std/50
   before the forward (the *intended* behavior of inpainting.ipynb cell 17,
   whose in-notebook version is a no-op)
 - EMA output smoothing: ema = ema*exp_weight + out*(1-exp_weight),
   initialized to the first output
 - PSNR backtracking: if the tracked PSNR drops >`backtrack_threshold` dB
   below the last good value, restore the parameter snapshot (kept in HBM,
   not host memory) and skip that update; otherwise refresh the snapshot.
   (The reference restores and then still applies the stale gradient —
   an artifact of the closure protocol we deliberately do not copy.)
 - optimize-over selection: the trainable pytree may contain 'net' params,
   the 'input' code z, and/or 'down' degradation params
   (get_params, common_utils.py:29-53).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dip_tpu.ops.losses import psnr


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FitConfig:
    num_iter: int = 3000
    lr: float = 0.01
    optimizer: str = "adam"          # 'adam' | 'lbfgs'
    reg_noise_std: float = 0.0       # input jitter std
    param_noise: bool = False        # conv-kernel jitter
    exp_weight: float | None = None  # EMA factor, e.g. 0.99
    opt_input: bool = False          # optimize over z as well/instead
    opt_over: str = "net"            # reference-style selector: 'net,input,down'
                                     # ('input' here == opt_input=True; 'down'
                                     # params enter via extra_params)
    backtrack: bool = False
    backtrack_threshold: float = 5.0
    log_every: int = 100             # scan chunk size between host callbacks
    lbfgs_warmup: int = 100          # Adam warm-up steps before LBFGS
    lbfgs_warmup_lr: float = 1e-3
    compute_dtype: str | None = None  # opt-in 'bfloat16' forward/backward:
                                      # params + loss stay f32 (mixed
                                      # precision); quality-validate per task
    # staged jitter schedule: ((until_step, std), ...) overrides
    # reg_noise_std per step range — the big feature-inversion recipe
    # (feature_inversion.ipynb cell 21: *10 until 10k, *2 until 15k, /2
    # until 20k). Evaluated on-device with jnp.select.
    reg_noise_schedule: tuple | None = None
    # In-loop PRNG implementation. 'rbg' (default) is jax's TPU-fast RBG
    # generator: the input-jitter draw is C*H*W normals per iteration (8.4M
    # at 512^2/32ch) where threefry costs measurable step time (20.98 ->
    # 20.79 ms bf16 @512^2). Statistical quality is ample for jitter noise,
    # and no exact-stream parity exists to preserve — the reference draws
    # unseeded CUDA noise (noise.normal_(), denoising.ipynb cell 10). The
    # init key (weights) keeps the caller's impl so param init is unchanged.
    # None = inherit the caller's key impl (threefry for jax.random.key).
    rng_impl: str | None = "rbg"
    # scan body unroll factor: >1 lets the XLA scheduler interleave/overlap
    # work across adjacent iterations at the cost of code size. Measured per
    # workload; 1 is the safe default.
    scan_unroll: int = 1
    # Pack optimizer leaves smaller than this many elements into one fused
    # update vector (fit/packed.py) — XLA emits a ~fixed-cost fusion per
    # leaf otherwise. None = off.
    pack_small_threshold: int | None = None
    # Conv lowering: None = process default (ops/dispatch.py, i.e. the
    # DIP_CONV_DOTS env at import), 'auto' = shifted-matmul dots for bf16 /
    # XLA conv ops for f32 (the measured-best split, docs/PERF.md), 'dots' /
    # 'conv' force one. Applied trace-time around every model trace this
    # Engine performs, so its compiled programs reflect THIS config even if
    # the global dispatch flags change in between.
    conv_impl: str | None = None
    # Fused upsample2x->conv3x3 decoder seam (ops/up_conv.py): None =
    # process default (DIP_UP_CONV env), 'auto' = on whenever the dots
    # lowering is active for the trace dtype, 'on'/'off' force.
    up_conv: str | None = None
    # Extend space-to-depth to ALL stride-2 dots convs, not just
    # thin-channel inputs (ops/dot_conv.py). None = process default
    # (DIP_CONV_S2D_WIDE env); True/False force. Perf experiment.
    conv_s2d_wide: bool | None = None
    # Hand-written VJP for stride-1 dots convs (dot_conv._conv2d_dots_cv):
    # data-grad as one flipped-kernel dots conv instead of k^2 scatter-pad
    # chains. None = process default (DIP_DOTS_VJP env). Perf experiment.
    dots_vjp: bool | None = None
    # f32 path: route thin-channel stride-2 convs (the z input conv)
    # through the space-to-depth dots form while keeping XLA conv ops
    # elsewhere. None = process default (DIP_S2D_F32 env). Perf experiment.
    s2d_f32: bool | None = None
    # Packed space-to-depth form of the thin-channel stride-2 conv: one 4-D
    # (N, H/2, W/2, 4C) s2d tensor + ceil(k/2)^2 full-lane tap dots instead
    # of k^2 narrow slices of a 6-D view (ops/dot_conv.py). 'off' | 'xla'
    # (one XLA transpose — measured worse) | 'pallas' (one-pass kernel,
    # ops/pallas_s2d) | 'auto' (pallas inside its envelope, else the 6-D
    # path). None = process default (DIP_S2D_PACKED env).
    s2d_packed: str | None = None
    # Emission for thin-channel (C<=16) stride-1 3x3 convs — the decoder's
    # HR skip-branch convs: 'dots' | 'conv' (one XLA conv op) | 'im2col'
    # (one narrow column tensor + one dot) | 'auto' (measured policy,
    # ops/dot_conv.py). None = process default (DIP_THIN_CONV env).
    thin_conv: str | None = None
    # Emission of the Pallas seam backward's HR -> phase-major dz
    # transform: 'xla' | 'pallas' (one-pass pack kernel, bit-exact) |
    # 'auto'. None = process default (DIP_SEAM_DZ env).
    seam_dz: str | None = None
    # Fold the decoder's skip-branch conv result into the Pallas seam
    # kernel's epilogue add (True) instead of a separate full-HR XLA add.
    # None = process default (DIP_SEAM_CARRY env).
    seam_carry: bool | None = None
    # BN statistics lowering: 'twopass' (jnp.mean + jnp.var) | 'sumsq'
    # (single-read fused sum/sum-of-squares, models/blocks.py). None =
    # process default (DIP_BN_MOMENTS env). Perf experiment.
    bn_moments: str | None = None
    # Fused-seam emission: 'auto' (dots taps on the bf16 dots lowering,
    # one conv op on the f32 conv-op lowering — the wave-7 measured split)
    # | 'dots' (9 tap matmuls) | 'conv' (one XLA conv with the (3,3,C,4F)
    # effective kernel — tap accumulation stays on-chip, ops/up_conv.py).
    # None = process default (DIP_UP_CONV_IMPL).
    up_conv_impl: str | None = None


class FitState(NamedTuple):
    params: Any              # trainable pytree: {'net': ..., ['input': z], ['down': ...]}
    opt_state: Any
    z: jnp.ndarray           # saved base input (unused source when opt_input)
    ema_out: jnp.ndarray
    key: jax.Array
    snapshot: Any            # params snapshot for backtracking
    last_track: jnp.ndarray  # tracked PSNR at last good snapshot
    step: jnp.ndarray


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def unalias(tree):
    """Force every leaf onto its own buffer. JAX dedupes identical constants
    (e.g. the Adam mu/nu zero trees) and jitted inits may alias equal
    outputs; donated scan arguments must be distinct buffers."""
    return jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True) if hasattr(x, "shape") else x, tree
    )

def _jitter_params(params: Any, key: jax.Array, scale: float = 1.0 / 50.0) -> Any:
    """Add N(0,1)*std(leaf)*scale to every conv kernel (ndim==4 leaf)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        if hasattr(leaf, "ndim") and leaf.ndim == 4:
            leaf = leaf + jax.random.normal(k, leaf.shape, leaf.dtype) * (
                jnp.std(leaf) * scale
            )
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _make_tx(cfg: FitConfig) -> optax.GradientTransformation:
    # NOTE: optax.flatten(adam) was tried and measured SLOWER (21.0 ->
    # 21.75 ms bf16 @512^2): the ravel/concat/split traffic costs more than
    # the ~117 small per-leaf update fusions, whose trace durations overlap
    # async DMA anyway.
    if cfg.optimizer == "adam":
        tx = optax.adam(cfg.lr)
        if cfg.pack_small_threshold:
            from dip_tpu.fit.packed import pack_small

            tx = pack_small(tx, cfg.pack_small_threshold)
        return tx
    if cfg.optimizer == "lbfgs":
        return optax.lbfgs(learning_rate=None)
    if cfg.optimizer == "sgd":
        return optax.sgd(cfg.lr)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class Engine:
    """Per-image DIP fit compiled to a single scanned device program.

    Args:
        model: a flax.linen module mapping z (1,H,W,Cin) -> image (1,H,W,Cout).
        loss_fn: (trainable_params, out, aux) -> scalar. `aux` is an arbitrary
            pytree of device constants (targets, masks, LR images, stored
            features ...). Receives the trainable pytree so degradation
            operators with learnable params ('down') can participate.
        cfg: FitConfig.
        metrics_fn: optional (out, ema_out, aux) -> dict of scalars, computed
            on-device each iteration and returned stacked. If backtracking is
            on, it must provide key 'psnr_track' (PSNR vs the fit target —
            what the reference calls psnr_noisy).
    """

    def __init__(
        self,
        model,
        loss_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
        cfg: FitConfig,
        metrics_fn: Callable[[jnp.ndarray, jnp.ndarray, Any], dict] | None = None,
    ):
        self.model = model
        self.loss_fn = loss_fn
        if "input" in cfg.opt_over.split(",") and not cfg.opt_input:
            cfg = dataclasses.replace(cfg, opt_input=True)
        self.cfg = cfg
        self.metrics_fn = metrics_fn
        self.tx = _make_tx(cfg)
        self._chunk_jit = None
        self._render_jit = None

    def _dispatch_ctx(self):
        """Trace-time dispatch override for cfg.conv_impl / cfg.up_conv
        (no-op for None fields)."""
        from dip_tpu.ops import dispatch

        return dispatch.override(conv_impl=self.cfg.conv_impl,
                                 up_conv=self.cfg.up_conv,
                                 conv_s2d_wide=self.cfg.conv_s2d_wide,
                                 dots_vjp=self.cfg.dots_vjp,
                                 s2d_f32=self.cfg.s2d_f32,
                                 s2d_packed=self.cfg.s2d_packed,
                                 thin_conv=self.cfg.thin_conv,
                                 seam_dz=self.cfg.seam_dz,
                                 seam_carry=self.cfg.seam_carry,
                                 bn_moments=self.cfg.bn_moments,
                                 up_conv_impl=self.cfg.up_conv_impl)

    # -- initialization ------------------------------------------------------

    def init_state(self, key: jax.Array, z: jnp.ndarray, aux: Any = None,
                   extra_params: dict | None = None) -> FitState:
        """Initialize params/optimizer/EMA. `extra_params` adds trainable
        leaves beyond the net (e.g. {'down': ...})."""
        del aux
        k_init, k_noise, k_run = jax.random.split(key, 3)
        if self.cfg.rng_impl is not None:
            # re-seed the *run* key under the requested impl; init keys keep
            # the caller's impl so weight init matches non-rbg runs exactly
            seed = jax.random.randint(k_run, (), 0, jnp.iinfo(jnp.int32).max)
            k_run = jax.random.key(seed, impl=self.cfg.rng_impl)
        # jit the whole init: one compiled program instead of per-op dispatch
        # (matters on remote-tunneled TPU backends and 1-core CPU hosts)
        with self._dispatch_ctx():
            variables = jax.jit(self.model.init)(
                {"params": k_init, "noise": k_noise}, z)
        trainable = {"net": variables.get("params", {})}
        if self.cfg.opt_input:
            trainable["input"] = z
        if extra_params:
            trainable.update(extra_params)
        opt_state = self.tx.init(trainable)
        out_shape = jax.eval_shape(
            lambda p, x: self.model.apply({"params": p}, x,
                                          rngs={"noise": k_noise}),
            trainable["net"], z,
        )
        ema = jnp.zeros(out_shape.shape, out_shape.dtype)
        # the backtracking snapshot doubles param memory; only carry it when
        # the feature is on (an empty dict is a leafless pytree)
        snapshot = trainable if self.cfg.backtrack else {}
        state = FitState(
            params=trainable,
            opt_state=opt_state,
            z=z,
            ema_out=ema,
            key=k_run,
            snapshot=snapshot,
            last_track=jnp.asarray(0.0, jnp.float32),
            step=jnp.asarray(0, jnp.int32),
        )
        return unalias(state)

    # -- one optimization step (pure; scan body) ------------------------------

    def _forward(self, params: Any, z_used: jnp.ndarray, noise_key: jax.Array,
                 param_key: jax.Array | None):
        p_net = params["net"]
        if self.cfg.param_noise and param_key is not None:
            p_net = _jitter_params(p_net, param_key)
        if self.cfg.compute_dtype is not None:
            # mixed precision: cast params + input for the forward (MXU runs
            # bf16 at 2x); master params and the loss remain f32
            cd = jnp.dtype(self.cfg.compute_dtype)
            p_net = jax.tree_util.tree_map(lambda x: x.astype(cd), p_net)
            z_used = z_used.astype(cd)
            with self._dispatch_ctx():
                out = self.model.apply({"params": p_net}, z_used,
                                       rngs={"noise": noise_key})
            return out.astype(jnp.float32)
        with self._dispatch_ctx():
            return self.model.apply({"params": p_net}, z_used,
                                    rngs={"noise": noise_key})

    def step(self, state: FitState, aux: Any) -> tuple[FitState, dict]:
        cfg = self.cfg
        key, k_jit, k_param, k_gen = jax.random.split(state.key, 4)

        z_base = state.params["input"] if cfg.opt_input else state.z
        if cfg.reg_noise_schedule:
            bounds = jnp.asarray([b for b, _ in cfg.reg_noise_schedule])
            stds = jnp.asarray([s for _, s in cfg.reg_noise_schedule],
                               jnp.float32)
            std = jnp.select([state.step < b for b in bounds], list(stds),
                             jnp.float32(cfg.reg_noise_std))
            z_used = z_base + std * jax.random.normal(
                k_jit, z_base.shape, z_base.dtype)
        elif cfg.reg_noise_std > 0:
            z_used = z_base + cfg.reg_noise_std * jax.random.normal(
                k_jit, z_base.shape, z_base.dtype
            )
        else:
            z_used = z_base

        def loss_of(params):
            if cfg.opt_input:
                # jitter is re-applied around the *current* trainable z
                zb = params["input"]
                zu = zb + (z_used - z_base)
            else:
                zu = z_used
            out = self._forward(params, zu, k_gen,
                                k_param if cfg.param_noise else None)
            return self.loss_fn(params, out, aux), out

        (loss, out), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)

        if cfg.optimizer == "lbfgs":
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params,
                value=loss, grad=grads,
                value_fn=lambda p: loss_of(p)[0],
            )
        else:
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # EMA smoothing (initialized to the first output)
        if cfg.exp_weight is not None:
            w = cfg.exp_weight
            ema = jnp.where(state.step == 0, out,
                            state.ema_out * w + out * (1 - w))
        else:
            ema = out

        metrics = {"loss": loss}
        if self.metrics_fn is not None:
            metrics.update(self.metrics_fn(out, ema, aux))

        snapshot = state.snapshot
        last_track = state.last_track
        if cfg.backtrack:
            track = metrics["psnr_track"]
            drop = (track - state.last_track) < -cfg.backtrack_threshold
            pick = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(drop, x, y), a, b
            )
            # on drop: restore the stash and skip this update; otherwise the
            # stash becomes the *pre-update* params — exactly the reference's
            # closure, which stashes before optimizer.step() (denoising
            # cell 10). (Also keeps params/snapshot distinct expressions, so
            # XLA can't alias them into one donated output buffer.)
            new_params = pick(state.snapshot, new_params)
            snapshot = pick(state.snapshot, state.params)
            last_track = jnp.where(drop, state.last_track, track)
            metrics["backtracked"] = drop.astype(jnp.float32)

        new_state = FitState(
            params=new_params,
            opt_state=opt_state,
            z=state.z,
            ema_out=ema,
            key=key,
            snapshot=snapshot,
            last_track=last_track,
            step=state.step + 1,
        )
        return new_state, metrics

    # -- scanned execution ----------------------------------------------------

    def run_chunk(self, state: FitState, aux: Any, length: int):
        """`length` steps as one lax.scan (trace-time constant)."""
        def body(s, _):
            return self.step(s, aux)
        return jax.lax.scan(body, state, None, length=length,
                            unroll=self.cfg.scan_unroll)

    def _get_chunk_jit(self):
        if self._chunk_jit is None:
            self._chunk_jit = jax.jit(
                lambda s, aux, length: self.run_chunk(s, aux, length),
                static_argnums=(2,),
                donate_argnums=(0,),
            )
        return self._chunk_jit

    def run(self, state: FitState, aux: Any,
            callback: Callable[[int, dict, FitState], None] | None = None):
        """Drive the full fit: jitted chunks of `log_every` steps, optional
        host callback between chunks. Returns (final_state, history dict of
        stacked per-iteration metrics as numpy arrays)."""
        cfg = self.cfg
        if cfg.optimizer == "lbfgs" and cfg.lbfgs_warmup > 0:
            state = self._warmup(state, aux)

        chunk = self._get_chunk_jit()
        remaining = cfg.num_iter
        hist_chunks: list[dict] = []
        it = 0
        while remaining > 0:
            n = min(cfg.log_every, remaining)
            state, hist = chunk(state, aux, n)
            remaining -= n
            it += n
            if callback is not None:
                # host sync per chunk only when the caller wants live logs
                host_hist = jax.tree_util.tree_map(np.asarray, hist)
                hist_chunks.append(host_hist)
                callback(it, host_hist, state)
            else:
                # keep history on device: chunks pipeline without host syncs
                hist_chunks.append(hist)
        history = jax.tree_util.tree_map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs]),
            *hist_chunks,
        )
        return state, history

    def _warmup(self, state: FitState, aux: Any) -> FitState:
        """Adam warm-up before LBFGS (common_utils.py:208-214)."""
        cfg = self.cfg
        warm = Engine(
            self.model,
            self.loss_fn,
            dataclasses.replace(
                cfg, optimizer="adam", lr=cfg.lbfgs_warmup_lr,
                num_iter=cfg.lbfgs_warmup, backtrack=False,
            ),
            self.metrics_fn,
        )
        # unalias: optax.lbfgs state holds references to the param buffers
        # themselves, which breaks donation in the scanned chunk
        wstate = unalias(state._replace(opt_state=warm.tx.init(state.params)))
        wstate, _ = jax.jit(
            lambda s, a: warm.run_chunk(s, a, cfg.lbfgs_warmup)
        )(wstate, aux)
        return unalias(wstate._replace(opt_state=self.tx.init(wstate.params)))

    # -- rendering -------------------------------------------------------------

    def render(self, state: FitState) -> jnp.ndarray:
        """Final forward pass with the saved (un-jittered) input.

        Jitted and cached: an eager per-op forward is hundreds of device
        dispatches, which costs *seconds* per call on remote-tunneled
        backends — unjitted renders were the entire FitQueue b8 "slowdown"
        (9 it/s aggregate vs 75 once renders are compiled; /tmp qdiag,
        round 3)."""
        if self._render_jit is None:
            def _render(state):
                z = state.params["input"] if self.cfg.opt_input else state.z
                return self._forward(state.params, z, jax.random.key(0), None)
            self._render_jit = jax.jit(_render)
        return self._render_jit(state)


# ---------------------------------------------------------------------------
# functional facade
# ---------------------------------------------------------------------------

def init_fit(model, loss_fn, cfg: FitConfig, key, z, aux=None, metrics_fn=None,
             extra_params=None):
    eng = Engine(model, loss_fn, cfg, metrics_fn)
    return eng, eng.init_state(key, z, aux, extra_params)


def fit(model, loss_fn, cfg: FitConfig, key, z, aux=None, metrics_fn=None,
        callback=None, extra_params=None):
    """One-call fit. Returns (final output image, final state, history)."""
    eng, state = init_fit(model, loss_fn, cfg, key, z, aux, metrics_fn, extra_params)
    state, history = eng.run(state, aux, callback)
    out = eng.render(state)
    return out, state, history


def default_metrics(target: jnp.ndarray, gt: jnp.ndarray | None = None):
    """Standard DIP metrics: PSNR vs fit target (tracked for backtracking),
    plus PSNR of raw/EMA output vs ground truth when available."""
    def fn(out, ema, aux):
        m = {"psnr_track": psnr(out, target)}
        if gt is not None:
            m["psnr_gt"] = psnr(out, gt)
            m["psnr_gt_sm"] = psnr(ema, gt)
        return m
    return fn
