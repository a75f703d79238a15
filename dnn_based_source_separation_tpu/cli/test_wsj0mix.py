"""wsj0-mix evaluation CLI.

Capability parity: reference `egs/wsj0-mix/*/local/test.py` + TesterBase
(`egs/wsj0-mix/common/src/driver.py:228-390`): rebuild the model from the
checkpoint alone, report per-utterance SI-SDRi/SDRi/SIRi/SAR (+PESQ via the
native CLI if provided), dump estimate WAVs.
"""
from __future__ import annotations

import argparse

from ..criterion import NegSISDR, PIT1d
from ..data import WaveTestDataset
from ..models.base import load_model
from ..train.tester import Tester
from ..utils import enable_persistent_compilation_cache, set_seed


def build_parser():
    p = argparse.ArgumentParser("test_wsj0mix")
    p.add_argument("--test_wav_root", type=str, required=True)
    p.add_argument("--test_list_path", type=str, required=True)
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--n_sources", type=int, default=2)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--pesq_bin", type=str, default=None)
    p.add_argument("--filt_len", type=int, default=512)
    p.add_argument("--seed", type=int, default=111)
    # spectrogram-domain models (DANet/ADANet/deep clustering): run the
    # clustering inference + mixture-phase resynthesis path instead.
    p.add_argument("--spec_kind", type=str, default=None,
                   choices=[None, "danet", "adanet", "embedding"])
    p.add_argument("--n_fft", type=int, default=256)
    p.add_argument("--hop_length", type=int, default=64)
    p.add_argument("--window_fn", type=str, default="hann")
    p.add_argument("--iter_clustering", type=int, default=10)
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    set_seed(args.seed)
    enable_persistent_compilation_cache()

    model, params, _ = load_model(args.model_path)
    dataset = WaveTestDataset(args.test_wav_root, args.test_list_path, n_sources=args.n_sources)
    criterion = PIT1d(NegSISDR(), n_sources=args.n_sources)
    if args.spec_kind:
        from ..train.tester import AttractorTester

        tester = AttractorTester(
            model, params, dataset, criterion,
            n_fft=args.n_fft, hop_length=args.hop_length,
            window_fn=args.window_fn, kind=args.spec_kind,
            n_sources=args.n_sources, iter_clustering=args.iter_clustering,
            sample_rate=args.sample_rate, out_dir=args.out_dir,
            pesq_bin=args.pesq_bin, filt_len=args.filt_len,
        )
    else:
        tester = Tester(
            model, params, dataset, criterion,
            sample_rate=args.sample_rate, out_dir=args.out_dir,
            pesq_bin=args.pesq_bin, filt_len=args.filt_len,
        )
    return tester.run()


if __name__ == "__main__":
    main()
