"""Wavesplit trainer: joint speaker + separation loss over speaker batches.

Capability parity: reference `egs/wsj0-mix/wavesplit/src/adhoc_driver.py`
(Trainer:15-215) + `adhoc_criterion.py` (MultiDomainLoss:308): batches carry
(mixture, sources, speaker indices); training computes the per-frame PIT
speaker loss against the utterance's embedding rows, sorts the speaker
vectors by the winning permutation, conditions the separation stack on the
sorted centroids, and sums the per-layer reconstruction loss with the
speaker loss (+ optional embedding entropy regularization). Validation runs
the clustering inference path with a plain PIT criterion.

TPU-first: the whole training step (speaker PIT + FiLM separation + losses)
is ONE jitted XLA program; the reference's separate no_grad sorting forward
is unnecessary because the integer argmin carries no gradient.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models.wavesplit import entropy_regularization_loss
from .trainer import Trainer


class WaveSplitTrainer(Trainer):
    """Trainer whose train loader yields (mixture, sources, spk_idx)."""

    def __init__(self, model, train_loader, valid_loader, reconst_criterion,
                 eval_criterion, optimizer, config, mesh=None, init_params=None,
                 entropy_reg: bool = False):
        if init_params is None and not config.continue_from:
            mixture, _, _ = next(iter(train_loader))
            init_params = model.init(jax.random.PRNGKey(0), jnp.asarray(mixture[:1]))
        super().__init__(model, train_loader, valid_loader, reconst_criterion,
                         optimizer, config, mesh=mesh, init_params=init_params,
                         eval_criterion=eval_criterion)

        def train_step(variables, opt_state, mixture, sources, spk_idx):
            params = variables["params"]
            aux = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                est_all, spk_loss = model.apply(
                    {"params": p, **aux}, mixture, spk_idx,
                    method="forward_train",
                )
                # est_all: (B, n_layers, n_src, T); every layer's skip head
                # regresses the (speaker-sorted) sources — no output PIT.
                rec = reconst_criterion(est_all, sources[:, None])
                loss = rec + jnp.mean(spk_loss)
                if entropy_reg:
                    loss = loss + entropy_regularization_loss(p["spk_embedding"])
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return {"params": params, **aux}, opt_state, loss

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def eval_step(variables, mixture, sources):
            est = model.apply(variables, mixture)  # clustering inference path
            out = eval_criterion(est, sources)
            loss = out[0] if isinstance(out, tuple) else out
            return loss, est

        self.eval_step = jax.jit(eval_step)

    # run_one_epoch_train: the base Trainer loop handles arbitrary-arity
    # batches (device prefetch, progress logging, throughput included).
