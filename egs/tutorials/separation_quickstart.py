"""Quickstart: train a tiny Conv-TasNet on synthetic mixtures, then separate."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.criterion import NegSISDR, PIT1d
from dnn_based_source_separation_tpu.data import DataLoader, SyntheticMixtureDataset
from dnn_based_source_separation_tpu.models import ConvTasNet
from dnn_based_source_separation_tpu.train import make_optimizer, make_train_step


def main():
    model = ConvTasNet(
        n_basis=64, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=64, sep_bottleneck_channels=32, sep_skip_channels=32,
        sep_num_blocks=2, sep_num_layers=4, causal=False, n_sources=2,
    )
    loader = DataLoader(SyntheticMixtureDataset(n_items=32, samples=8000), batch_size=8, shuffle=True)
    mixture, sources = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(mixture))

    optimizer = make_optimizer("adam", 1e-3, max_norm=5.0)
    opt_state = optimizer.init(variables["params"])
    criterion = PIT1d(NegSISDR(), n_sources=2)
    step = make_train_step(model, criterion, optimizer)

    for epoch in range(3):
        losses = []
        for mixture, sources in loader:
            variables, opt_state, loss = step(variables, opt_state,
                                              jnp.asarray(mixture), jnp.asarray(sources))
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.3f} (negative SI-SDR, lower is better)")

    est = model.apply(variables, jnp.asarray(mixture[:1]))
    print("separated:", est.shape)


if __name__ == "__main__":
    main()
