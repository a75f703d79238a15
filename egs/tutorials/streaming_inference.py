"""Tutorial: realtime-style chunk-by-chunk separation with a causal model.

The reference demoed realtime separation with pyaudio microphone buffers;
here the same loop runs file-to-file (swap `blocks()` for an audio callback
in a live app). Two APIs:
  * --exact (default): ExactStreamingSeparator — per-layer state, output
    matches the offline forward to float rounding (zero quality deviation);
  * --windowed: StreamingSeparator — rolling-context window (~23 dB
    agreement, any model shape).
Run: python streaming_inference.py <checkpoint> <wav> [--windowed]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

from dnn_based_source_separation_tpu.data.audio_io import read_wav, write_wav
from dnn_based_source_separation_tpu.models.base import load_model
from dnn_based_source_separation_tpu.models.streaming import (
    ExactStreamingSeparator,
    StreamingSeparator,
)


def main(ckpt, wav, hop=4000, context=16000, sr=8000, windowed=False):
    model, params, _ = load_model(ckpt)
    x, sr = read_wav(wav)
    T = (len(x) // hop) * hop
    if windowed:
        stream = StreamingSeparator(model, params, hop_samples=hop,
                                    context_samples=context)
    else:
        stream = ExactStreamingSeparator(model, params, hop_samples=hop)

    outs = []
    for s in range(0, T, hop):          # <- the "audio callback"
        outs.append(stream.process(x[None, s:s + hop]))
    if not windowed:
        outs.append(stream.flush())
    est = np.concatenate(outs, axis=-1)  # (n_sources, ~T)

    for i, sig in enumerate(est):
        write_wav(f"stream_source{i}.wav", sig / (np.abs(sig).max() + 1e-9), sr)
    print(f"wrote {est.shape[0]} sources, {est.shape[-1]/sr:.1f}s each "
          f"({'windowed' if windowed else 'exact'} streaming)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: python streaming_inference.py <checkpoint> <wav> "
                 "[--windowed]")
    main(sys.argv[1], sys.argv[2], windowed="--windowed" in sys.argv[3:])
