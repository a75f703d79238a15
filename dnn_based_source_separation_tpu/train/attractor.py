"""Attractor trainer (DANet/ADANet path): oracle assignments in the batch.

Capability parity: reference AttractorTrainer/AttractorTester
(`egs/wsj0-mix/common/src/driver.py:400-701`): batches carry
(|mixture| spec, |sources| spec, ideal-mask assignment, threshold weight);
training feeds oracle attractors, evaluation runs the clustering path and
can resynthesize with the mixture phase (Tester-side).
"""
from __future__ import annotations

import jax.numpy as jnp

from .steps import make_attractor_train_step, make_eval_step
from .trainer import Trainer


class AttractorTrainer(Trainer):
    """Trainer whose loaders yield (mix_amp, src_amp, assignment, weight)."""

    def __init__(self, model, train_loader, valid_loader, criterion, optimizer,
                 config, mesh=None, init_params=None, n_sources: int = 2):
        self.n_sources = n_sources
        if init_params is None and not config.continue_from:
            import jax

            mix, src, assign, weight = next(iter(train_loader))
            init_params = model.init(
                jax.random.PRNGKey(0), jnp.asarray(mix[:1]),
                jnp.asarray(assign[:1]), jnp.asarray(weight[:1]),
            )
        super().__init__(model, train_loader, valid_loader, criterion, optimizer,
                         config, mesh=mesh, init_params=init_params)
        self.train_step = make_attractor_train_step(model, criterion, optimizer, mesh=mesh)

        def eval_criterion(estimates, sources):
            out = criterion(estimates, sources)
            return out[0] if isinstance(out, tuple) else out

        # Inference path: no assignment -> clustering inside the model.
        import jax

        def eval_step(variables, mixture, sources):
            est = model.apply(variables, mixture, None, None, self.n_sources)
            return eval_criterion(est, sources), est

        self.eval_step = jax.jit(eval_step)

    # run_one_epoch_train: the base Trainer loop handles arbitrary-arity
    # batches (device prefetch, progress logging, throughput included).

    def run_one_epoch_eval(self, epoch: int) -> float:
        total, n_batches = 0.0, 0
        for batch in self.valid_loader:
            mix, src = jnp.asarray(batch[0]), jnp.asarray(batch[1])
            loss, _ = self.eval_step(self.params, mix, src)
            total += float(loss)
            n_batches += 1
        return total / max(n_batches, 1)


class AnchoredAttractorTrainer(AttractorTrainer):
    """ADANet driver: anchored attractors, no oracle assignment at train time.

    Capability parity: reference AnchoredAttractorTrainer
    (`egs/wsj0-mix/common/src/driver.py:544-596`) — batches still carry the
    ideal-mask assignment (the loader is shared with DANet) but the model only
    consumes (|mixture|, threshold weight, n_sources); the PIT criterion
    matches estimated masks to sources.
    """

    def __init__(self, model, train_loader, valid_loader, criterion, optimizer,
                 config, mesh=None, init_params=None, n_sources: int = 2,
                 dropout_rng=None):
        import jax
        import optax

        if init_params is None and not config.continue_from:
            mix, _, _, weight = next(iter(train_loader))
            init_params = model.init(
                jax.random.PRNGKey(0), jnp.asarray(mix[:1]),
                jnp.asarray(weight[:1]), n_sources,
            )
        Trainer.__init__(self, model, train_loader, valid_loader, criterion,
                         optimizer, config, mesh=mesh, init_params=init_params,
                         dropout_rng=dropout_rng)
        self.n_sources = n_sources

        def train_step(variables, opt_state, rng, mixture, sources, assignment, weight):
            params = variables["params"]
            aux = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                v = {"params": p, **aux}
                kwargs = {}
                if rng is not None:
                    kwargs = {"rngs": {"dropout": rng}, "train": True}
                est = model.apply(v, mixture, weight, n_sources, **kwargs)
                out = criterion(est, sources)
                return out[0] if isinstance(out, tuple) else out

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return {"params": params, **aux}, opt_state, loss

        jitted = jax.jit(train_step, donate_argnums=(0, 1), static_argnums=())
        rng_holder = {"rng": dropout_rng}

        def stepper(variables, opt_state, *batch):
            rng = None
            if rng_holder["rng"] is not None:
                rng_holder["rng"], rng = jax.random.split(rng_holder["rng"])
            return jitted(variables, opt_state, rng, *batch)

        if dropout_rng is None:
            self.train_step = lambda v, o, *b: jitted(v, o, None, *b)
        else:
            self.train_step = stepper
        # The stepper splits its own rng; the base loop must not append one.
        self.dropout_rng = None

        def eval_criterion(estimates, sources):
            out = criterion(estimates, sources)
            return out[0] if isinstance(out, tuple) else out

        def eval_step(variables, mixture, sources):
            est = model.apply(variables, mixture, None, self.n_sources)
            return eval_criterion(est, sources), est

        self.eval_step = jax.jit(eval_step)


class EmbeddingTrainer(AttractorTrainer):
    """Deep-clustering driver: affinity loss on unit-norm embeddings.

    Capability parity: reference Trainer for deep-clustering
    (`egs/wsj0-mix/deep-clustering/local/train.py` + driver.py) — batches are
    the ideal-mask spectrogram tuples; loss = AffinityLoss(V, Y, weight)
    where V = model(|mixture|) and Y is the ideal binary assignment.
    """

    def __init__(self, model, train_loader, valid_loader, criterion, optimizer,
                 config, mesh=None, init_params=None, n_sources: int = 2):
        import jax
        import optax

        if init_params is None and not config.continue_from:
            mix, _, _, _ = next(iter(train_loader))
            init_params = model.init(jax.random.PRNGKey(0), jnp.asarray(mix[:1]))
        Trainer.__init__(self, model, train_loader, valid_loader, criterion,
                         optimizer, config, mesh=mesh, init_params=init_params)
        self.n_sources = n_sources

        def affinity(variables, mixture, assignment, weight):
            emb = model.apply(variables, mixture)  # (B, F, T, D)
            B, F, T, D = emb.shape
            V = emb.reshape(B, F * T, D)
            n = assignment.shape[1]
            Y = jnp.transpose(assignment, (0, 2, 3, 1)).reshape(B, F * T, n)
            w = weight.reshape(B, F * T)
            return criterion(V, Y, binary_mask=w)

        def train_step(variables, opt_state, mixture, sources, assignment, weight):
            params = variables["params"]
            aux = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                return affinity({"params": p, **aux}, mixture, assignment, weight)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return {"params": params, **aux}, opt_state, loss

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._affinity = jax.jit(affinity)

    def run_one_epoch_eval(self, epoch: int) -> float:
        total, n_batches = 0.0, 0
        for batch in self.valid_loader:
            mix, _, assign, weight = (jnp.asarray(b) for b in batch)
            total += float(self._affinity(self.params, mix, assign, weight))
            n_batches += 1
        return total / max(n_batches, 1)
