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

    def run_one_epoch_train(self, epoch: int) -> float:
        total, n_batches = 0.0, 0
        for idx, batch in enumerate(self.train_loader):
            batch = tuple(jnp.asarray(b) for b in batch)
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(self.mesh, batch)
            self.params, self.opt_state, loss = self.train_step(
                self.params, self.opt_state, *batch
            )
            total += float(loss)
            n_batches += 1
        return total / max(n_batches, 1)

    def run_one_epoch_eval(self, epoch: int) -> float:
        total, n_batches = 0.0, 0
        for batch in self.valid_loader:
            mix, src = jnp.asarray(batch[0]), jnp.asarray(batch[1])
            loss, _ = self.eval_step(self.params, mix, src)
            total += float(loss)
            n_batches += 1
        return total / max(n_batches, 1)
