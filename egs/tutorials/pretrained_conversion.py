"""Convert a reference PyTorch Conv-TasNet checkpoint to flax params.

Point MODEL_PATH at a `best.pth`/`last.pth` from the reference hub
(PRETRAINED.md) and the converted model runs on TPU with the same weights.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import sys

from dnn_based_source_separation_tpu.hub import build_from_torch_checkpoint


def main(path):
    model, params = build_from_torch_checkpoint(path)
    print("converted:", type(model).__name__, "params:", model.num_parameters(params))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: python pretrained_conversion.py <best.pth>")
    main(sys.argv[1])
