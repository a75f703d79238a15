"""Epoch-loop Trainer with LR-halving, early stop, best/last checkpoints.

Capability parity: reference `egs/wsj0-mix/common/src/driver.py:20-226` and
the per-recipe AdhocTrainer (`egs/wsj0-mix/conv-tasnet/src/adhoc_driver.py`):
  * valid-loss improvement -> save best.ckpt, reset counter;
  * valid_loss >= prev_loss -> no_improvement += 1;
      >= 3 consecutive -> halve LR; >= 10 -> stop training;
  * last.ckpt every epoch; loss.png per epoch; first-5 validation WAV dumps;
  * --continue_from resume restoring optimizer state, counters, history.

The hot loop is one compiled XLA program (steps.make_train_step) with the
batch sharded over the mesh 'data' axis.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import load_model, save_model
from .steps import (
    get_learning_rate,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 100
    exp_dir: str = "exp"
    continue_from: Optional[str] = None
    overwrite: bool = False
    lr_halving_patience: int = 3
    early_stop_patience: int = 10
    save_valid_wavs: int = 5
    sample_rate: int = 8000
    log_interval: int = 100
    profile_dir: Optional[str] = None  # jax.profiler trace of epoch 0
    # Stop after this many wall-clock seconds (checked at epoch boundaries;
    # last.ckpt is still written, so --continue_from resumes cleanly). Used
    # by the sustained-training soak (scripts/bench_train.py --sustained).
    time_budget_sec: Optional[float] = None


class Trainer:
    """Drives epoch training of any registered separation model."""

    def __init__(
        self,
        model,
        train_loader,
        valid_loader,
        criterion: Callable,
        optimizer,
        config: TrainerConfig,
        mesh=None,
        init_params=None,
        eval_criterion: Callable | None = None,
        train_kwargs: dict | None = None,
        compute_dtype=None,
        dropout_rng=None,
    ):
        self.model = model
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.criterion = criterion
        self.optimizer = optimizer
        self.config = config
        self.mesh = mesh

        self.last_epoch_stats = None  # pipeline stats of the latest train epoch
        self.model_dir = os.path.join(config.exp_dir, "model")
        self.loss_dir = os.path.join(config.exp_dir, "loss")
        self.sample_dir = os.path.join(config.exp_dir, "sample")
        for d in (self.model_dir, self.loss_dir, self.sample_dir):
            os.makedirs(d, exist_ok=True)

        # dropout_rng (a jax PRNGKey) enables stochastic nn.Dropout training
        # paths; the key is split inside the compiled step each batch.
        self.dropout_rng = dropout_rng
        self.train_step = make_train_step(
            model, criterion, optimizer, mesh=mesh, train_kwargs=train_kwargs,
            compute_dtype=compute_dtype, with_dropout_rng=dropout_rng is not None,
        )
        self.eval_step = make_eval_step(model, eval_criterion or criterion, mesh=mesh)

        if config.continue_from:
            _, self.params, extra = load_model(config.continue_from)
            opt_template = optimizer.init(self.params["params"])
            self.opt_state = flax.serialization.from_state_dict(opt_template, extra["optim"])
            self.start_epoch = int(extra["epoch"]) + 1
            self.best_loss = float(extra["best_loss"])
            self.prev_loss = float(extra["prev_loss"])
            self.no_improvement = int(extra["no_improvement"])
            self.train_loss = list(extra["train_loss"])
            self.valid_loss = list(extra["valid_loss"])
        else:
            best = os.path.join(self.model_dir, "best.ckpt")
            if os.path.exists(best) and not config.overwrite:
                raise ValueError(f"{best} already exists; set overwrite=True to continue.")
            if init_params is None:
                example = next(iter(train_loader))
                init_params = model.init(jax.random.PRNGKey(0), jnp.asarray(example[0][:1]))
            self.params = init_params
            self.opt_state = optimizer.init(self.params["params"])
            self.start_epoch = 0
            self.best_loss = float("inf")
            self.prev_loss = float("inf")
            self.no_improvement = 0
            self.train_loss = []
            self.valid_loss = []

    # -- epoch loop -------------------------------------------------------
    def run(self):
        cfg = self.config
        run_start = time.time()
        for epoch in range(self.start_epoch, cfg.epochs):
            start = time.time()
            train_loss = self.run_one_epoch_train(epoch)
            valid_loss = self.run_one_epoch_eval(epoch)
            end = time.time()
            print(
                f"[Epoch {epoch + 1}/{cfg.epochs}] loss (train): {train_loss:.5f}, "
                f"loss (valid): {valid_loss:.5f}, {end - start:.3f} [sec]",
                flush=True,
            )
            self.train_loss.append(train_loss)
            self.valid_loss.append(valid_loss)

            stop = False
            if valid_loss < self.best_loss:
                self.best_loss = valid_loss
                self.no_improvement = 0
                self.save_checkpoint(epoch, os.path.join(self.model_dir, "best.ckpt"))
            elif valid_loss >= self.prev_loss:
                self.no_improvement += 1
                if self.no_improvement >= cfg.early_stop_patience:
                    print("Stop training")
                    stop = True
                elif self.no_improvement >= cfg.lr_halving_patience:
                    prev_lr = get_learning_rate(self.opt_state)
                    if prev_lr == prev_lr:  # nan => schedule-managed LR
                        lr = 0.5 * prev_lr
                        print(f"Learning rate: {prev_lr} -> {lr}")
                        self.opt_state = set_learning_rate(self.opt_state, lr)
            else:
                self.no_improvement = 0

            self.prev_loss = valid_loss
            self.save_checkpoint(epoch, os.path.join(self.model_dir, "last.ckpt"))
            self.draw_loss_curve()
            if stop:
                break
            if (cfg.time_budget_sec is not None
                    and time.time() - run_start >= cfg.time_budget_sec):
                print(f"Time budget reached ({cfg.time_budget_sec:.0f} s); "
                      "stopping after checkpoint.", flush=True)
                break

    def run_one_epoch_train(self, epoch: int) -> float:
        cfg = self.config
        epoch_start = time.time()
        audio_seconds = 0.0
        profiling = cfg.profile_dir and epoch == self.start_epoch
        if profiling:
            import jax.profiler

            jax.profiler.start_trace(cfg.profile_dir)
        # Losses stay on device until the epoch ends: fetching the scalar
        # every step would synchronize the pipeline (very costly through a
        # remote-tunneled chip).
        device_losses = []
        n_batches = 0
        # Double-buffered device prefetch: the next batch's host->device DMA
        # overlaps the current step's compute (see data/loader.py).
        from ..data.loader import prefetch_to_device
        from ..parallel.mesh import data_sharding

        sharding = data_sharding(self.mesh) if self.mesh is not None else None
        batches = prefetch_to_device(self.train_loader, size=2, sharding=sharding)
        # Pipeline instrumentation: time spent blocked fetching the next
        # staged batch (host pipeline + device_put backpressure) vs total
        # iteration time. The step dispatch itself is async, so fetch time
        # is where a too-slow loader shows up.
        fetch_seconds = 0.0
        iter_seconds: list = []
        it = iter(batches)
        idx = -1
        while True:
            t0 = time.perf_counter()
            batch = next(it, None)
            if batch is None:
                break
            fetch_seconds += time.perf_counter() - t0
            idx += 1
            if self.dropout_rng is not None:
                self.params, self.opt_state, loss, self.dropout_rng = self.train_step(
                    self.params, self.opt_state, *batch, self.dropout_rng
                )
            else:
                self.params, self.opt_state, loss = self.train_step(
                    self.params, self.opt_state, *batch
                )
            iter_seconds.append(time.perf_counter() - t0)
            audio_seconds += batch[0].shape[0] * batch[0].shape[-1] / cfg.sample_rate
            device_losses.append(loss)
            n_batches += 1
            if (idx + 1) % cfg.log_interval == 0:
                running = float(jnp.mean(jnp.stack(device_losses)))
                print(
                    f"[Epoch {epoch + 1}] iter {idx + 1}/{len(self.train_loader)} "
                    f"loss: {running:.5f}",
                    flush=True,
                )
            if profiling and idx >= 2:  # a few steps are enough for a trace
                import jax.profiler

                jax.profiler.stop_trace()
                profiling = False
        if profiling:
            import jax.profiler

            jax.profiler.stop_trace()
        total = float(jnp.sum(jnp.stack(device_losses))) if device_losses else 0.0
        elapsed = time.time() - epoch_start
        if audio_seconds and elapsed > 0:
            its = np.sort(np.asarray(iter_seconds)) if iter_seconds else np.zeros(1)
            self.last_epoch_stats = {
                "audio_sec_per_sec": audio_seconds / elapsed,
                "fetch_frac": fetch_seconds / elapsed,
                "iter_p50_ms": float(its[len(its) // 2]) * 1e3,
                "iter_p99_ms": float(its[min(len(its) - 1, int(len(its) * 0.99))]) * 1e3,
                "n_batches": n_batches,
            }
            print(
                f"[Epoch {epoch + 1}] training throughput: "
                f"{audio_seconds / elapsed:.1f} audio-seconds/sec "
                f"(iter p50 {self.last_epoch_stats['iter_p50_ms']:.1f} ms, "
                f"p99 {self.last_epoch_stats['iter_p99_ms']:.1f} ms, "
                f"loader-stall {self.last_epoch_stats['fetch_frac']:.1%})",
                flush=True,
            )
        return total / max(n_batches, 1)

    def run_one_epoch_eval(self, epoch: int) -> float:
        cfg = self.config
        total, n_batches = 0.0, 0
        for idx, (mixture, sources) in enumerate(self.valid_loader):
            mixture, sources = jnp.asarray(mixture), jnp.asarray(sources)
            loss, estimates = self.eval_step(self.params, mixture, sources)
            total += float(loss)
            n_batches += 1
            if idx < cfg.save_valid_wavs:
                self._dump_samples(epoch, idx, mixture, estimates)
        return total / max(n_batches, 1)

    def _dump_samples(self, epoch, idx, mixture, estimates):
        from ..data.audio_io import write_wav

        out_dir = os.path.join(self.sample_dir, f"{idx}")
        os.makedirs(out_dir, exist_ok=True)
        mix = np.asarray(mixture[0]).reshape(-1)
        norm = np.abs(mix).max() + 1e-9
        write_wav(os.path.join(out_dir, "mixture.wav"), mix / norm, self.config.sample_rate)
        est = np.asarray(estimates[0])
        for s in range(est.shape[0]):
            sig = est[s] / (np.abs(est[s]).max() + 1e-9)
            write_wav(
                os.path.join(out_dir, f"epoch{epoch + 1}_source{s}.wav"),
                sig,
                self.config.sample_rate,
            )

    # -- persistence ------------------------------------------------------
    def save_checkpoint(self, epoch: int, path: str):
        extra = {
            "optim": flax.serialization.to_state_dict(
                # batched async fetch; per-leaf np.asarray serializes one
                # sync transfer per array (minutes on remote backends)
                jax.device_get(self.opt_state)
            ),
            "epoch": epoch,
            "best_loss": self.best_loss,
            "prev_loss": self.prev_loss,
            "no_improvement": self.no_improvement,
            "train_loss": list(self.train_loss),
            "valid_loss": list(self.valid_loss),
        }
        save_model(path, self.model, self.params, extra)

    def draw_loss_curve(self):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, ax = plt.subplots()
        epochs = np.arange(1, len(self.train_loss) + 1)
        ax.plot(epochs, self.train_loss, label="train")
        ax.plot(epochs, self.valid_loss, label="valid")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax.legend()
        fig.savefig(os.path.join(self.loss_dir, "loss.png"), bbox_inches="tight")
        plt.close(fig)


class ORPITTrainer(Trainer):
    """One-and-Rest PIT driver over variable source counts.

    Capability parity: the reference ORPIT recipe driver
    (`egs/wsj0-mix/orpit_conv-tasnet/local/train.py` + driver.py
    AdhocTrainer): batches are (mixture, zero-padded sources, counts) from
    `WaveTrainVariableSourcesDataset`; the model always estimates the
    (one, rest) pair and the ORPIT criterion consumes the per-item counts.
    """

    def __init__(self, model, train_loader, valid_loader, criterion, optimizer,
                 config, mesh=None, init_params=None):
        import jax
        import optax

        if init_params is None and not config.continue_from:
            mixture, _, _ = next(iter(train_loader))
            init_params = model.init(jax.random.PRNGKey(0), jnp.asarray(mixture[:1]))
        super().__init__(model, train_loader, valid_loader, criterion, optimizer,
                         config, mesh=mesh, init_params=init_params)

        def train_step(variables, opt_state, mixture, sources, counts):
            params = variables["params"]
            aux = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                est = model.apply({"params": p, **aux}, mixture)
                out = criterion(est, sources, n_sources=counts)
                return out[0] if isinstance(out, tuple) else out

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return {"params": params, **aux}, opt_state, loss

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def eval_step(variables, mixture, sources, counts):
            est = model.apply(variables, mixture)
            out = criterion(est, sources, n_sources=counts)
            loss = out[0] if isinstance(out, tuple) else out
            return loss, est

        self.eval_step = jax.jit(eval_step)

    def run_one_epoch_eval(self, epoch: int) -> float:
        total, n_batches = 0.0, 0
        for batch in self.valid_loader:
            mixture, sources, counts = (jnp.asarray(b) for b in batch)
            loss, _ = self.eval_step(self.params, mixture, sources, counts)
            total += float(loss)
            n_batches += 1
        return total / max(n_batches, 1)
