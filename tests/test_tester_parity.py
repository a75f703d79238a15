"""Metric-level parity: our Tester vs the reference's OWN TesterBase.

Round-5 closure of the measurement-pipeline half of the <0.1 dB north star:
the forward-parity tests (test_reference_parity.py) prove converted models
compute the same estimates; THIS file proves the evaluation pipeline itself
-- PIT loss deltas (SI-SDRi), BSS Eval SDRi/SIRi/SAR plumbing (permutation
handling, repeated-mixture baseline, per-source averaging), the PESQ
subprocess protocol, and the CSV line format -- produces the same numbers.

Protocol: train the reference's own torch Conv-TasNet (tiny config, CPU) on
a small synthetic wsj0-protocol corpus, then evaluate the SAME tt utterances
twice:
  (a) the reference's verbatim Tester (`egs/wsj0-mix/conv-tasnet/src/
      adhoc_driver.py:46` -> `egs/wsj0-mix/common/src/driver.py:257-390`),
      with torchaudio shimmed over this repo's WAV IO and
      mir_eval.separation.bss_eval_sources shimmed over this repo's
      golden-fixture-tested BSS Eval v3 (`utils/bss.py`) -- mir_eval wheels
      are unavailable in this container, so the BSS kernel is shared; what
      this comparison exercises end-to-end is everything AROUND it, plus the
      fully independent SI-SDR/PIT path (torch reference criterion vs our
      JAX criterion).
  (b) this repo's Tester (`train/tester.py`) on the hub-converted
      checkpoint.
and assert every per-utterance column agrees to <0.1 dB (PESQ to <0.05 MOS;
both sides shell out to the same native P.862-style binary).
"""
from __future__ import annotations

import contextlib
import io
import os
import re
import subprocess
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_SRC = "/root/reference/src"
REFERENCE_EGS_SRC = "/root/reference/egs/wsj0-mix/common/src"
REFERENCE_ADHOC = "/root/reference/egs/wsj0-mix/conv-tasnet/src"
PESQ_BIN = os.path.join(os.path.dirname(__file__), "..", "native", "pesq", "pesq")

TINY = dict(
    n_basis=64, kernel_size=16, stride=8, enc_basis="trainable",
    dec_basis="trainable", enc_nonlinear="relu",
    sep_hidden_channels=64, sep_bottleneck_channels=32, sep_skip_channels=32,
    sep_kernel_size=3, sep_num_blocks=4, sep_num_layers=2,
    causal=False, n_sources=2,
)
SAMPLE_RATE = 8000
N_TT = 4


def _install_torchaudio_shim():
    """Functional torchaudio.load/save over this repo's WAV IO, so the
    reference dataset/driver run verbatim (torchaudio wheel not in image)."""
    from dnn_based_source_separation_tpu.data.audio_io import read_wav, write_wav

    if getattr(sys.modules.get("torchaudio"), "_parity_shim", False):
        return

    shim = types.ModuleType("torchaudio")
    shim._parity_shim = True

    def load(path, frame_offset=0, num_frames=-1):
        frames = None if num_frames in (-1, None) else int(num_frames)
        x, sr = read_wav(path, start=int(frame_offset), frames=frames)
        t = torch.from_numpy(np.asarray(x, dtype=np.float32))
        t = t.t() if t.dim() == 2 else t.unsqueeze(0)  # -> (C, T)
        return t, sr

    def save(path, signal, sample_rate, bits_per_sample=16):
        assert bits_per_sample == 16
        x = signal.detach().cpu().numpy()
        write_wav(path, x[0] if x.ndim == 2 and x.shape[0] == 1 else x.T, sample_rate)

    shim.load, shim.save = load, save
    shim.transforms = types.ModuleType("torchaudio.transforms")
    shim.functional = types.ModuleType("torchaudio.functional")
    sys.modules["torchaudio"] = shim
    sys.modules["torchaudio.transforms"] = shim.transforms
    sys.modules["torchaudio.functional"] = shim.functional


def _install_mir_eval_shim():
    """mir_eval.separation.bss_eval_sources over this repo's BSS Eval v3."""
    from dnn_based_source_separation_tpu.utils.bss import (
        bss_eval_sources as ours,
    )

    if "mir_eval" in sys.modules:
        return
    mir_eval = types.ModuleType("mir_eval")
    separation = types.ModuleType("mir_eval.separation")

    def bss_eval_sources(reference_sources, estimated_sources, **kwargs):
        sdr, sir, sar, perm = ours(
            np.asarray(reference_sources), np.asarray(estimated_sources)
        )
        return sdr, sir, sar, np.asarray(perm)

    separation.bss_eval_sources = bss_eval_sources
    mir_eval.separation = separation
    sys.modules["mir_eval"] = mir_eval
    sys.modules["mir_eval.separation"] = separation


@pytest.fixture(scope="module")
def ref_env():
    for path in (REFERENCE_ADHOC, REFERENCE_EGS_SRC, REFERENCE_SRC):
        if not os.path.isdir(path):
            pytest.skip("reference tree not available")
        if path not in sys.path:
            sys.path.insert(0, path)
    _install_torchaudio_shim()
    _install_mir_eval_shim()
    # The reference driver/dataset modules resolve by bare name.
    for mod in ("dataset", "driver", "adhoc_driver"):
        sys.modules.pop(mod, None)
    yield


@pytest.fixture(scope="module")
def pesq_bin():
    path = os.path.abspath(PESQ_BIN)
    if not os.path.exists(path):
        src_dir = os.path.dirname(path)
        subprocess.run(["make"], cwd=src_dir, check=True)
    return path


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from dnn_based_source_separation_tpu.data.synthetic import write_quality_corpus

    root = str(tmp_path_factory.mktemp("parity_corpus"))
    tr_root, tr_list = write_quality_corpus(root, "tr", n_utts=24)
    tt_root, tt_list = write_quality_corpus(root, "tt", n_utts=N_TT)
    return dict(tr_root=tr_root, tr_list=tr_list, tt_root=tt_root, tt_list=tt_list)


@pytest.fixture(scope="module")
def trained_reference_ckpt(ref_env, corpus, tmp_path_factory):
    """Train the reference's own torch Conv-TasNet a few epochs on CPU and
    save a checkpoint in the reference's own format (config + state_dict,
    `models/conv_tasnet.py:build_model`)."""
    from dataset import TrainDataLoader, WaveTrainDataset
    from models.conv_tasnet import ConvTasNet as RefConvTasNet
    from criterion.sdr import NegSISDR
    from criterion.pit import PIT1d

    torch.manual_seed(0)
    model = RefConvTasNet(**TINY)
    dataset = WaveTrainDataset(
        corpus["tr_root"], corpus["tr_list"], samples=SAMPLE_RATE * 2, n_sources=2
    )
    loader = TrainDataLoader(dataset, batch_size=4, shuffle=True)
    pit_criterion = PIT1d(NegSISDR(), n_sources=2)
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)

    model.train()
    for _epoch in range(3):
        for mixture, sources in loader:
            optimizer.zero_grad()
            loss, _ = pit_criterion(model(mixture), sources)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
            optimizer.step()

    model.eval()
    package = model.get_config()
    package["state_dict"] = model.state_dict()
    path = str(tmp_path_factory.mktemp("parity_ckpt") / "best.pth")
    torch.save(package, path)
    # Sanity: the few epochs must separate above the floor, otherwise the
    # comparison would be of near-degenerate estimates.
    with torch.no_grad():
        mixture, sources = next(iter(loader))
        loss, _ = pit_criterion(model(mixture), sources)
    assert float(loss) < -1.0, f"reference model failed to train: {float(loss)}"
    return path


def _pesq_wrapper(tmp_dir: str, pesq_bin: str) -> str:
    """An ITU-CLI-compatible `PESQ` executable: the reference driver invokes
    `./PESQ +<sr> ref est | grep Prediction | awk '{print $5}'`
    (driver.py:354-357), i.e. it expects the old ITU print format
    `Prediction : PESQ_MOS = <score>` where the score is field 5."""
    path = os.path.join(tmp_dir, "PESQ")
    with open(path, "w") as f:
        f.write(
            "#!/bin/sh\n"
            f'score=$("{pesq_bin}" "$@" | grep Prediction | awk \'{{print $NF}}\')\n'
            '[ -n "$score" ] && echo "Prediction : PESQ_MOS = $score"\n'
        )
    os.chmod(path, 0o755)
    return path


def _parse_csv(text: str):
    """{utt_id: [loss, loss_improvement, sdri, siri, sar, pesq]} from the
    shared per-utterance CSV protocol."""
    rows = {}
    for line in text.splitlines():
        m = re.match(r"^(\w+), (-?[\d.]+(?:, -?[\d.]+){5})$", line.strip())
        if m:
            rows[m.group(1)] = [float(v) for v in m.group(2).split(", ")]
    return rows


def _run_reference_tester(ckpt_path, corpus, pesq_bin, tmp_dir):
    from dataset import TestDataLoader, WaveTestDataset
    from adhoc_driver import Tester as RefTester
    from models.conv_tasnet import ConvTasNet as RefConvTasNet
    from criterion.sdr import NegSISDR
    from criterion.pit import PIT1d

    dataset = WaveTestDataset(corpus["tt_root"], corpus["tt_list"], n_sources=2)
    loader = TestDataLoader(dataset, batch_size=1, shuffle=False)
    model = RefConvTasNet.build_model(ckpt_path)
    args = types.SimpleNamespace(
        sample_rate=SAMPLE_RATE, n_sources=2, out_dir=None, use_cuda=False,
        model_path=ckpt_path,
    )
    tester = RefTester(model, loader, PIT1d(NegSISDR(), n_sources=2), args)

    # TesterBase.run expects ./PESQ in the cwd and creates its tmp dir there.
    _pesq_wrapper(tmp_dir, pesq_bin)
    cwd = os.getcwd()
    buf = io.StringIO()
    try:
        os.chdir(tmp_dir)
        with torch.no_grad(), contextlib.redirect_stdout(buf):
            tester.run()
    finally:
        os.chdir(cwd)
    return _parse_csv(buf.getvalue())


def _run_our_tester(ckpt_path, corpus, pesq_bin):
    import jax.numpy as jnp
    import jax

    from dnn_based_source_separation_tpu.criterion import NegSISDR, PIT1d
    from dnn_based_source_separation_tpu.data import WaveTestDataset
    from dnn_based_source_separation_tpu.hub.torch_convert import convert_conv_tasnet
    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.train.tester import Tester

    package = torch.load(ckpt_path, map_location="cpu")
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_conv_tasnet(package["state_dict"], package)
    )
    model = ConvTasNet(**TINY)
    dataset = WaveTestDataset(corpus["tt_root"], corpus["tt_list"], n_sources=2)
    tester = Tester(
        model, params, dataset, PIT1d(NegSISDR(), n_sources=2),
        sample_rate=SAMPLE_RATE, pesq_bin=pesq_bin,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tester.run()
    return _parse_csv(buf.getvalue())


@pytest.mark.slow
def test_tester_metric_parity(ref_env, corpus, trained_reference_ckpt, pesq_bin,
                              tmp_path):
    theirs = _run_reference_tester(
        trained_reference_ckpt, corpus, pesq_bin, str(tmp_path)
    )
    ours = _run_our_tester(trained_reference_ckpt, corpus, pesq_bin)

    assert len(theirs) == N_TT, f"reference CSV rows: {sorted(theirs)}"
    assert set(ours) == set(theirs)

    cols = ["loss", "SI-SDRi", "SDRi", "SIRi", "SAR", "PESQ"]
    max_delta = {c: 0.0 for c in cols}
    for utt in sorted(theirs):
        for c, a, b in zip(cols, theirs[utt], ours[utt]):
            max_delta[c] = max(max_delta[c], abs(a - b))
    # dB-valued columns: <0.1 dB. PESQ: same binary + same wav writer on both
    # sides; the only wiggle is est/ref pairing (PIT perm vs BSS perm) and
    # 16-bit re-quantization order, so hold it tighter than the CSV's 3
    # decimals would ever show a user.
    for c in cols[:5]:
        assert max_delta[c] < 0.1, f"{c}: max per-utterance delta {max_delta}"
    assert max_delta["PESQ"] < 0.05, f"PESQ delta {max_delta}"
