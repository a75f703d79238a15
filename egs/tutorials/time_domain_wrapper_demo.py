"""Run a spectrogram-domain model on raw waveforms via TimeDomainWrapper."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dnn_based_source_separation_tpu.models import MDenseNet, TimeDomainWrapper


def main():
    n_fft, hop = 64, 16
    model = MDenseNet(
        in_channels=1, num_features=4, growth_rate=[2, 3, 2], kernel_size=3,
        max_bin=33, depth=[2, 2, 2], growth_rate_final=2,
        kernel_size_final=3, depth_final=2,
    )
    spec = jnp.zeros((1, 1, 33, 11))
    params = model.init(jax.random.PRNGKey(0), spec)

    wrapper = TimeDomainWrapper(model, params, n_fft, hop)
    wave = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, 800)), jnp.float32)
    out = wrapper(wave)
    print("wave in:", wave.shape, "-> wave out:", out.shape)


if __name__ == "__main__":
    main()
