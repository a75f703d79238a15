"""Jitted, mesh-sharded train/eval steps and the optimizer factory.

Replaces the reference's per-batch `.cuda()` + DataParallel hot loop
(`egs/wsj0-mix/common/src/driver.py:132-164`) with a single compiled XLA
program: forward + PIT loss + backward + clip + Adam update, batch sharded
over the mesh 'data' axis, gradients reduced by XLA psum over ICI.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_optimizer(name: str = "adam", lr: float = 1e-3, max_norm: Optional[float] = None,
                   momentum: float = 0.9):
    """sgd/adam/rmsprop with optional global-norm clipping.

    Mirrors the recipe optimizer choice (`local/train.py:103-110`) and
    clip_grad_norm (`driver.py:152`). Learning rate rides
    optax.inject_hyperparams so the trainer's LR-halving schedule mutates it
    inside the optimizer state without recompilation.
    """
    table = {"adam": optax.adam, "sgd": optax.sgd, "rmsprop": optax.rmsprop}
    if name == "momentum-sgd":
        # Reference deep-clustering recipe optimizer (train.sh: momentum=9e-1).
        opt = optax.inject_hyperparams(optax.sgd)(learning_rate=lr, momentum=momentum)
    elif name not in table:
        raise ValueError(f"Unsupported optimizer: {name}")
    else:
        opt = optax.inject_hyperparams(table[name])(learning_rate=lr)
    if max_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(max_norm), opt)
    return opt


def _find_hyperparams(opt_state):
    """Locate the inject_hyperparams state inside a possibly chained state."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if isinstance(opt_state, tuple):
        for s in opt_state:
            found = _find_hyperparams(s)
            if found is not None:
                return found
    return None


def get_learning_rate(opt_state) -> float:
    hp = _find_hyperparams(opt_state)
    if hp is None:  # schedule-managed optimizer (no injected hyperparams)
        return float("nan")
    return float(hp.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    hp = _find_hyperparams(opt_state)
    if hp is None:  # schedule-managed: the per-step schedule owns the LR
        return opt_state
    hp.hyperparams["learning_rate"] = lr
    return opt_state


def make_warmup_optimizer(lr_peak_k1: float, lr_post_k2: float, d_model: int,
                          warmup_steps: int, steps_per_epoch: int,
                          max_norm: Optional[float] = None):
    """Adam with the DPTNet recipe's LR schedule (reference
    `egs/wsj0-mix/dptnet/src/adhoc_driver.py:98-111`): a Noam-style linear
    ramp `k1 * d_model^-0.5 * (step+1) * warmup^-1.5` for the first
    `warmup_steps` updates, then an epoch-indexed exponential decay
    `k2 * 0.98^((epoch+1)//2)` (epoch = step // steps_per_epoch). The
    trainer's cv-plateau LR-halving is a no-op for this optimizer (the
    schedule overwrites the LR every step, as in the reference driver).
    """

    def schedule(step):
        stepf = jnp.asarray(step, jnp.float32)
        ramp = (lr_peak_k1 * d_model ** -0.5 * (stepf + 1.0)
                * warmup_steps ** -1.5)
        epoch = jnp.floor(stepf / steps_per_epoch)
        decay = lr_post_k2 * 0.98 ** jnp.floor((epoch + 1.0) / 2.0)
        return jnp.where(stepf > warmup_steps, decay, ramp)

    opt = optax.adam(learning_rate=schedule)
    if max_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(max_norm), opt)
    return opt


def make_train_step(
    model,
    criterion: Callable,
    optimizer,
    mesh: Optional[Mesh] = None,
    train_kwargs: Optional[dict] = None,
    compute_dtype=None,
    with_dropout_rng: bool = False,
    donate: bool = True,
) -> Callable:
    """Build jitted (variables, opt_state, mixture, sources) ->
    (variables, opt_state, loss).

    `variables` is the full flax variables dict; gradients flow through
    variables['params'] only, while auxiliary collections (e.g. UMX
    batch_stats) are threaded through `mutable` apply and carried forward.
    criterion follows the PIT protocol: returns (loss, pattern); plain
    scalar criteria also work. `train_kwargs` is forwarded to model.apply
    (e.g. {'train': True} for BatchNorm models).

    compute_dtype=jnp.bfloat16 enables mixed precision: the forward/backward
    run in bf16 (params cast inside the step, inputs cast), while the master
    params, loss and Adam state stay float32.

    with_dropout_rng=True changes the signature to (variables, opt_state,
    mixture, sources, rng) -> (variables, opt_state, loss, next_rng); the
    rng is split inside the compiled step and fed to apply as the 'dropout'
    stream (needed by models whose `train=True` path uses nn.Dropout, e.g.
    UMX dropout=0.4 between LSTM layers, reference open_unmix models.py).
    """
    import jax.numpy as jnp

    tk = train_kwargs or {}

    def _cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            tree,
        )

    def _step_core(variables, opt_state, mixture, sources, dropout_key=None):
        params = variables["params"]
        aux = {k: v for k, v in variables.items() if k != "params"}
        rngs = {"dropout": dropout_key} if dropout_key is not None else {}

        def loss_fn(p):
            if compute_dtype is not None:
                v = {"params": _cast(p, compute_dtype), **_cast(aux, compute_dtype)}
                mix_in = mixture.astype(compute_dtype)
            else:
                v = {"params": p, **aux}
                mix_in = mixture
            if aux:
                estimates, new_aux = model.apply(v, mix_in, mutable=list(aux.keys()), rngs=rngs, **tk)
            else:
                estimates, new_aux = model.apply(v, mix_in, rngs=rngs, **tk), {}
            if compute_dtype is not None:
                estimates = jax.tree_util.tree_map(
                    lambda e: e.astype(jnp.float32) if hasattr(e, "dtype") else e, estimates
                )
                new_aux = _cast(new_aux, jnp.float32)
            out = criterion(estimates, sources)
            loss = out[0] if isinstance(out, tuple) else out
            return loss, new_aux

        (loss, new_aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, **dict(new_aux)}, opt_state, loss

    if with_dropout_rng:
        def train_step(variables, opt_state, mixture, sources, rng):
            dropout_key, next_rng = jax.random.split(rng)
            variables, opt_state, loss = _step_core(variables, opt_state, mixture, sources, dropout_key)
            return variables, opt_state, loss, next_rng
    else:
        def train_step(variables, opt_state, mixture, sources):
            return _step_core(variables, opt_state, mixture, sources)

    donate_kw = {"donate_argnums": (0, 1)} if donate else {}
    if mesh is None:
        return jax.jit(train_step, **donate_kw)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    if with_dropout_rng:
        in_sh = (repl, repl, data, data, repl)
        out_sh = (repl, repl, repl, repl)
    else:
        in_sh = (repl, repl, data, data)
        out_sh = (repl, repl, repl)
    return jax.jit(
        train_step,
        in_shardings=in_sh,
        out_shardings=out_sh,
        **donate_kw,
    )


def make_eval_step(model, criterion: Callable, mesh: Optional[Mesh] = None) -> Callable:
    """Build jitted (variables, mixture, sources) -> (loss, estimates)."""

    def eval_step(variables, mixture, sources):
        estimates = model.apply(variables, mixture)
        out = criterion(estimates, sources)
        loss = out[0] if isinstance(out, tuple) else out
        return loss, estimates

    if mesh is None:
        return jax.jit(eval_step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        eval_step,
        in_shardings=(repl, data, data),
        out_shardings=(repl, data),
    )


def make_attractor_train_step(model, criterion, optimizer, mesh=None):
    """Train step for attractor models (DANet): oracle assignments ride the
    batch (reference AttractorTrainer, egs/wsj0-mix/common/src/driver.py:400).

    Batch = (mixture_amp (B,1,F,T), sources_amp (B,n,F,T), assignment,
    threshold_weight); loss = criterion(est_amp, sources_amp).
    """

    def train_step(variables, opt_state, mixture, sources, assignment, threshold_weight):
        params = variables["params"]
        aux = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            v = {"params": p, **aux}
            estimates = model.apply(v, mixture, assignment, threshold_weight)
            out = criterion(estimates, sources)
            loss = out[0] if isinstance(out, tuple) else out
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, **aux}, opt_state, loss

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, data, data, data, data),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
