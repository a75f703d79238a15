"""End-to-end recipe CLI smoke tests on synthetic corpora."""
import os

import numpy as np
import pytest

from dnn_based_source_separation_tpu.data.audio_io import write_wav


@pytest.fixture()
def wsj0_corpus(tmp_path):
    rng = np.random.default_rng(0)
    for split in ("tr", "cv", "tt"):
        root = tmp_path / split
        for sub in ("mix", "s1", "s2"):
            os.makedirs(root / sub)
        utts = []
        for i in range(2):
            T = 4000
            s1 = 0.1 * rng.standard_normal(T)
            s2 = 0.1 * rng.standard_normal(T)
            utt = f"{split}_utt{i}"
            write_wav(str(root / "s1" / f"{utt}.wav"), s1, 8000)
            write_wav(str(root / "s2" / f"{utt}.wav"), s2, 8000)
            write_wav(str(root / "mix" / f"{utt}.wav"), s1 + s2, 8000)
            utts.append(utt)
        (tmp_path / f"{split}.lst").write_text("\n".join(utts))
    return tmp_path


def test_train_and_test_wsj0mix_cli(wsj0_corpus, tmp_path):
    from dnn_based_source_separation_tpu.cli import test_wsj0mix, train_wsj0mix

    exp = str(tmp_path / "exp")
    train_wsj0mix.main([
        "--train_wav_root", str(wsj0_corpus / "tr"),
        "--train_list_path", str(wsj0_corpus / "tr.lst"),
        "--valid_wav_root", str(wsj0_corpus / "cv"),
        "--valid_list_path", str(wsj0_corpus / "cv.lst"),
        "--model", "conv-tasnet",
        "-N", "16", "-L", "8", "-H", "16", "-B", "8", "-Sc", "8",
        "-R", "1", "-X", "2",
        "--duration", "0.25", "--valid_duration", "0.5",
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ])
    assert os.path.exists(os.path.join(exp, "model", "last.ckpt"))

    summary = test_wsj0mix.main([
        "--test_wav_root", str(wsj0_corpus / "tt"),
        "--test_list_path", str(wsj0_corpus / "tt.lst"),
        "--model_path", os.path.join(exp, "model", "last.ckpt"),
        "--filt_len", "16",
    ])
    assert np.isfinite(summary["loss"])


def test_train_wsj0mix_furcanet(wsj0_corpus, tmp_path):
    """FurcaNet recipe path (reference egs/wsj0-mix/furcanet/local/train.py)."""
    from dnn_based_source_separation_tpu.cli import train_wsj0mix

    exp = str(tmp_path / "exp")
    train_wsj0mix.main([
        "--train_wav_root", str(wsj0_corpus / "tr"),
        "--train_list_path", str(wsj0_corpus / "tr.lst"),
        "--valid_wav_root", str(wsj0_corpus / "cv"),
        "--valid_list_path", str(wsj0_corpus / "cv.lst"),
        "--model", "furcanet",
        "-Hc", "8", "-Hr", "8", "-Bc", "2", "-Br", "1",
        "--duration", "0.25", "--valid_duration", "0.5",
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ])
    assert os.path.exists(os.path.join(exp, "model", "last.ckpt"))


def test_train_wsj0mix_wavesplit(tmp_path):
    """Wavesplit recipe path (reference egs/wsj0-mix/wavesplit): speaker
    batches, joint speaker + per-layer reconstruction loss, clustering eval."""
    from dnn_based_source_separation_tpu.cli import train_wsj0mix_wavesplit

    rng = np.random.default_rng(3)
    T = 4000
    corpus = tmp_path / "corpus"
    for split in ("tr", "cv"):
        root = corpus / split
        for sub in ("mix", "s1", "s2"):
            os.makedirs(root / sub)
        utts = []
        for i in range(3):
            s1 = 0.1 * rng.standard_normal(T)
            s2 = 0.1 * rng.standard_normal(T)
            # wsj0-style IDs: <spkA utt>_<gain>_<spkB utt>_<gain>
            utt = f"01{i}a010{i}_0.5_02{i}c020{i}_-0.5"
            write_wav(str(root / "s1" / f"{utt}.wav"), s1, 8000)
            write_wav(str(root / "s2" / f"{utt}.wav"), s2, 8000)
            write_wav(str(root / "mix" / f"{utt}.wav"), s1 + s2, 8000)
            utts.append(utt)
        (corpus / f"{split}.lst").write_text("\n".join(utts))

    exp = str(tmp_path / "exp")
    trainer = train_wsj0mix_wavesplit.main([
        "--train_wav_root", str(corpus / "tr"),
        "--train_list_path", str(corpus / "tr.lst"),
        "--valid_wav_root", str(corpus / "cv"),
        "--valid_list_path", str(corpus / "cv.lst"),
        "-D", "16", "--spk_num_layers", "2",
        "--sep_num_blocks", "1", "--sep_num_layers", "2",
        "--reg_criterion", "entropy",
        "--duration", "0.25", "--valid_duration", "0.5",
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ])
    assert os.path.exists(os.path.join(exp, "model", "last.ckpt"))
    assert np.isfinite(trainer.train_loss[0])


@pytest.fixture()
def musdb_corpus(tmp_path):
    rng = np.random.default_rng(1)
    names = ["trackA", "trackB"]
    sr = 4000
    for name in names:
        d = tmp_path / "train" / name
        os.makedirs(d)
        stems = {}
        for s in ("bass", "drums", "other", "vocals"):
            x = 0.05 * rng.standard_normal((sr, 2))  # stereo
            stems[s] = x
            write_wav(str(d / f"{s}.wav"), x, sr)
        write_wav(str(d / "mixture.wav"), sum(stems.values()), sr)
    (tmp_path / "train.txt").write_text("\n".join(names))
    (tmp_path / "validation.txt").write_text("trackB")
    return tmp_path, sr


@pytest.mark.parametrize("model", ["umx", "xumx"])
def test_train_musdb18_cli(musdb_corpus, tmp_path, model):
    from dnn_based_source_separation_tpu.cli import train_musdb18

    root, sr = musdb_corpus
    exp = str(tmp_path / f"exp_{model}")
    trainer = train_musdb18.main([
        "--musdb18_root", str(root),
        "--sample_rate", str(sr),
        "--duration", "0.25", "--valid_duration", "0.25",
        "--samples_per_epoch", "4",
        "--model", model,
        "--n_fft", "64", "--hop_length", "32",
        "--hidden_channels", "16", "--num_layers", "1", "--max_bin", "20",
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ])
    assert os.path.exists(os.path.join(exp, "model", "last.ckpt"))
    assert np.isfinite(trainer.train_loss[0])


def test_musdb18_full_pipeline_with_eval(musdb_corpus, tmp_path):
    """Train 1 epoch, then run chunked inference + Wiener + median SDR."""
    import os

    from dnn_based_source_separation_tpu.cli import test_musdb18, train_musdb18
    from dnn_based_source_separation_tpu.data.audio_io import write_wav

    root, sr = musdb_corpus
    # Add a test split.
    rng = np.random.default_rng(9)
    d = root / "test" / "trackT"
    os.makedirs(d)
    stems = {}
    for s in ("bass", "drums", "other", "vocals"):
        x = 0.05 * rng.standard_normal((sr, 2))
        stems[s] = x
        write_wav(str(d / f"{s}.wav"), x, sr)
    write_wav(str(d / "mixture.wav"), sum(stems.values()), sr)
    (root / "test.txt").write_text("trackT")

    exp = str(tmp_path / "exp_eval")
    train_musdb18.main([
        "--musdb18_root", str(root), "--sample_rate", str(sr),
        "--duration", "0.25", "--valid_duration", "0.25",
        "--samples_per_epoch", "2", "--model", "umx",
        "--n_fft", "64", "--hop_length", "32",
        "--hidden_channels", "16", "--num_layers", "1", "--max_bin", "20",
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ])
    table = test_musdb18.main([
        "--musdb18_root", str(root),
        "--model_path", os.path.join(exp, "model", "last.ckpt"),
        "--sample_rate", str(sr),
        "--duration", "0.5", "--win", "0.25", "--filt_len", "8",
        "--out_dir", str(tmp_path / "est"),
    ])
    assert set(table) == {"bass", "drums", "other", "vocals"}
    for stem in table.values():
        for metric in ("SDR", "ISR", "SIR", "SAR"):
            assert np.isfinite(stem[metric])


def test_oracle_masks_cli(wsj0_corpus):
    """IBM/IRM oracles must give positive SI-SDR improvement."""
    from dnn_based_source_separation_tpu.cli import test_oracle_masks

    for mask in ("ibm", "irm"):
        imp = test_oracle_masks.main([
            "--test_wav_root", str(wsj0_corpus / "tt"),
            "--test_list_path", str(wsj0_corpus / "tt.lst"),
            "--n_fft", "64", "--hop_length", "16",
            "--mask", mask,
        ])
        assert imp > 3.0, f"oracle {mask} should improve SI-SDR, got {imp}"


def test_create_mixtures_cli(tmp_path):
    from dnn_based_source_separation_tpu.cli import create_mixtures
    from dnn_based_source_separation_tpu.data.audio_io import read_wav, write_wav

    rng = np.random.default_rng(11)
    src_dir = tmp_path / "wsj0"
    os.makedirs(src_dir)
    entries = []
    for i in range(3):
        for spk in ("a", "b"):
            x = 0.1 * rng.standard_normal(4000)
            write_wav(str(src_dir / f"{spk}{i}.wav"), x, 8000)
        entries.append(f"a{i}.wav 0.0 b{i}.wav -2.5")
    lst = tmp_path / "tasks.txt"
    lst.write_text("\n".join(entries))

    out = tmp_path / "out"
    create_mixtures.main([
        "--list_path", str(lst), "--wav_root", str(src_dir),
        "--out_root", str(out), "--length", "min",
    ])
    mixes = sorted(os.listdir(out / "mix"))
    assert len(mixes) == 3
    m, _ = read_wav(str(out / "mix" / mixes[0]))
    s1, _ = read_wav(str(out / "s1" / mixes[0]))
    s2, _ = read_wav(str(out / "s2" / mixes[0]))
    np.testing.assert_allclose(m, s1 + s2, atol=2e-4)


def test_train_musdb18_d3net(musdb_corpus, tmp_path):
    from dnn_based_source_separation_tpu.cli import train_musdb18

    root, sr = musdb_corpus
    cfg = tmp_path / "d3.yaml"
    cfg.write_text("""
in_channels: 2
bands: [low, middle]
low:
  sections: 16
  num_features: 2
  growth_rate: [2, 2, 2]
  kernel_size: 3
  scale: 2
  num_d2blocks: [1, 1, 1]
  depth: [1, 1, 1]
middle:
  sections: 17
  num_features: 2
  growth_rate: [2, 2, 2]
  kernel_size: 3
  scale: 2
  num_d2blocks: [1, 1, 1]
  depth: [1, 1, 1]
full:
  num_features: 2
  growth_rate: [2, 2, 2]
  kernel_size: 3
  scale: 2
  num_d2blocks: [1, 1, 1]
  depth: [1, 1, 1]
final:
  growth_rate: 2
  kernel_size: 3
  depth: 1
""")
    exp = str(tmp_path / "exp_d3")
    trainer = train_musdb18.main([
        "--musdb18_root", str(root), "--sample_rate", str(sr),
        "--duration", "0.25", "--valid_duration", "0.25",
        "--samples_per_epoch", "2", "--model", "d3net",
        "--d3net_config", str(cfg),
        "--n_fft", "64", "--hop_length", "32",
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ])
    assert np.isfinite(trainer.train_loss[0])


@pytest.mark.parametrize("model,criterion,optimizer", [
    ("danet", "se", "rmsprop"),
    ("adanet", "l2loss", "adam"),
    ("deep-clustering", "affinity", "momentum-sgd"),
])
def test_train_wsj0mix_spec_cli(wsj0_corpus, tmp_path, model, criterion, optimizer):
    from dnn_based_source_separation_tpu.cli import train_wsj0mix_spec

    exp = str(tmp_path / f"exp_{model}")
    trainer = train_wsj0mix_spec.main([
        "--train_wav_root", str(wsj0_corpus / "tr"),
        "--train_list_path", str(wsj0_corpus / "tr.lst"),
        "--valid_wav_root", str(wsj0_corpus / "cv"),
        "--valid_list_path", str(wsj0_corpus / "cv.lst"),
        "--model", model, "--criterion", criterion, "--optimizer", optimizer,
        "--n_fft", "64", "--hop_length", "16",
        "-K", "8", "-H", "16", "-B", "1", "-N", "4",
        "--duration", "0.25", "--dropout", "0.2" if model == "adanet" else "0",
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ])
    assert os.path.exists(os.path.join(exp, "model", "last.ckpt"))
    assert np.isfinite(trainer.train_loss[-1])

    from dnn_based_source_separation_tpu.cli import test_wsj0mix

    kind = {"danet": "danet", "adanet": "adanet", "deep-clustering": "embedding"}[model]
    summary = test_wsj0mix.main([
        "--test_wav_root", str(wsj0_corpus / "tt"),
        "--test_list_path", str(wsj0_corpus / "tt.lst"),
        "--model_path", os.path.join(exp, "model", "last.ckpt"),
        "--spec_kind", kind, "--n_fft", "64", "--hop_length", "16",
        "--filt_len", "16",
    ])
    assert np.isfinite(summary["loss"])


def test_train_wsj0mix_orpit_cli(wsj0_corpus, tmp_path):
    from dnn_based_source_separation_tpu.cli import train_wsj0mix

    exp = str(tmp_path / "exp_orpit")
    trainer = train_wsj0mix.main([
        "--train_wav_root", str(wsj0_corpus / "tr"),
        "--train_list_path", str(wsj0_corpus / "tr.lst"),
        "--valid_wav_root", str(wsj0_corpus / "cv"),
        "--valid_list_path", str(wsj0_corpus / "cv.lst"),
        "--model", "conv-tasnet", "--criterion", "orpit",
        "--n_sources", "3",
        "-N", "16", "-L", "8", "-H", "16", "-B", "8", "-Sc", "8",
        "-R", "1", "-X", "2",
        "--duration", "0.25", "--valid_duration", "0.25",
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ])
    assert os.path.exists(os.path.join(exp, "model", "last.ckpt"))
    assert np.isfinite(trainer.train_loss[-1])


@pytest.mark.parametrize("model,extra", [
    ("conv-tasnet", ["-N", "16", "-L", "8", "-HH", "16", "-B", "8", "-Sc", "8",
                     "-R", "1", "-X", "2"]),
    # --criterion on the waveform models exercises the per-output-domain
    # override table (advisor round-2: the spectrogram adapter crashed here).
    ("mrx", ["--hidden_channels", "8", "--num_layers", "1",
             "--mrx_n_fft", "64,128", "--hop_length", "32",
             "--criterion", "mse"]),
    ("meta-tasnet", ["-N", "16", "-L", "8", "-HH", "8", "-B", "8", "-Sc", "8",
                     "-R", "1", "-X", "1", "--criterion", "mae"]),
    ("hrnet", ["--target", "vocals", "--hrnet_hidden", "4,8",
               "--n_fft", "64", "--hop_length", "32"]),
    ("cunet", ["--cunet_channels", "2,4,8", "--cunet_control_channels", "3,8",
               "--n_fft", "64", "--hop_length", "32"]),
])
def test_train_musdb18_more_models(musdb_corpus, tmp_path, model, extra):
    from dnn_based_source_separation_tpu.cli import train_musdb18

    root, sr = musdb_corpus
    exp = str(tmp_path / f"exp_{model}")
    trainer = train_musdb18.main([
        "--musdb18_root", str(root), "--sample_rate", str(sr),
        "--duration", "0.25", "--valid_duration", "0.25",
        "--samples_per_epoch", "2", "--model", model,
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ] + extra)
    assert os.path.exists(os.path.join(exp, "model", "last.ckpt"))
    assert np.isfinite(trainer.train_loss[0])


def test_train_musdb18_mmdense(musdb_corpus, tmp_path):
    from dnn_based_source_separation_tpu.cli import train_musdb18

    root, sr = musdb_corpus
    cfg = tmp_path / "mmdl.yaml"
    cfg.write_text("""
in_channels: 2
bands: [low, high]
causal: False
rnn_type: lstm
rnn_position: after_dense
low:
  sections: 16
  num_features: 4
  growth_rate: [2, 2, 2]
  hidden_channels: [0, 2, 0]
  kernel_size: 3
  scale: 2
  depth: [1, 1, 1]
high:
  sections: 17
  num_features: 4
  growth_rate: [2, 2, 2]
  hidden_channels: [0, 0, 0]
  kernel_size: 3
  scale: 2
  depth: [1, 1, 1]
full:
  num_features: 4
  growth_rate: [2, 2, 2]
  hidden_channels: [0, 2, 0]
  kernel_size: 3
  scale: 2
  depth: [1, 1, 1]
final:
  growth_rate: 2
  hidden_channels: 0
  kernel_size: 3
  depth: 1
""")
    for model in ("mm-densenet", "mm-dense-lstm"):
        exp = str(tmp_path / f"exp_{model}")
        trainer = train_musdb18.main([
            "--musdb18_root", str(root), "--sample_rate", str(sr),
            "--duration", "0.25", "--valid_duration", "0.25",
            "--samples_per_epoch", "2", "--model", model,
            "--mmdense_config", str(cfg),
            "--n_fft", "64", "--hop_length", "32",
            "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
        ])
        assert os.path.exists(os.path.join(exp, "model", "last.ckpt"))
        assert np.isfinite(trainer.train_loss[0])


def test_train_wsj0mix_wavesplit_3src(tmp_path):
    """3-speaker wavesplit: exercises the inverse-permutation speaker
    sorting (non-self-inverse 3-cycles) end to end."""
    from dnn_based_source_separation_tpu.cli import train_wsj0mix_wavesplit

    rng = np.random.default_rng(9)
    T = 4000
    corpus = tmp_path / "corpus"
    for split in ("tr", "cv"):
        root = corpus / split
        for sub in ("mix", "s1", "s2", "s3"):
            os.makedirs(root / sub)
        utts = []
        for i in range(2):
            srcs = [0.1 * rng.standard_normal(T) for _ in range(3)]
            utt = f"01{i}a010{i}_0.5_02{i}c020{i}_-0.5_44{i}o030{i}_0.1"
            for k, s in enumerate(srcs):
                write_wav(str(root / f"s{k + 1}" / f"{utt}.wav"), s, 8000)
            write_wav(str(root / "mix" / f"{utt}.wav"), sum(srcs), 8000)
            utts.append(utt)
        (corpus / f"{split}.lst").write_text("\n".join(utts))

    exp = str(tmp_path / "exp")
    trainer = train_wsj0mix_wavesplit.main([
        "--train_wav_root", str(corpus / "tr"),
        "--train_list_path", str(corpus / "tr.lst"),
        "--valid_wav_root", str(corpus / "cv"),
        "--valid_list_path", str(corpus / "cv.lst"),
        "--n_sources", "3",
        "-D", "16", "--spk_num_layers", "2",
        "--sep_num_blocks", "1", "--sep_num_layers", "2",
        "--duration", "0.25", "--valid_duration", "0.5",
        "--batch_size", "2", "--epochs", "1", "--exp_dir", exp,
    ])
    assert np.isfinite(trainer.train_loss[0])


def test_separate_cli_chunked(tmp_path):
    """--chunk_duration path: overlapped crossfaded longform scan."""
    import jax
    import jax.numpy as jnp

    from dnn_based_source_separation_tpu.cli import separate
    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.models.base import save_model

    model = ConvTasNet(
        n_basis=16, kernel_size=8, stride=4, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=16, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_num_blocks=1, sep_num_layers=2, causal=False, n_sources=2,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 4000), jnp.float32))
    ckpt = str(tmp_path / "m.ckpt")
    save_model(ckpt, model, params, {})

    rng = np.random.default_rng(0)
    wav = str(tmp_path / "mix.wav")
    write_wav(wav, 0.1 * rng.standard_normal(9000), 8000)

    out = str(tmp_path / "out")
    separate.main(["--model_path", ckpt, "--input", wav,
                   "--out_dir", out, "--chunk_duration", "0.5"])
    files = sorted(os.listdir(out))
    assert files == ["source0.wav", "source1.wav"]


def test_separate_cli_exact_streaming(tmp_path):
    """--streaming_hop path: exact chunk-by-chunk serving must reproduce the
    offline CLI output up to one 16-bit WAV quantization step."""
    import jax
    import jax.numpy as jnp

    from dnn_based_source_separation_tpu.cli import separate
    from dnn_based_source_separation_tpu.data.audio_io import read_wav
    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.models.base import save_model

    model = ConvTasNet(
        n_basis=16, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=16, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_num_blocks=1, sep_num_layers=3, causal=True, n_sources=2,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 4000), jnp.float32))
    ckpt = str(tmp_path / "m.ckpt")
    save_model(ckpt, model, params, {})

    rng = np.random.default_rng(3)
    # 8002 samples: OFF the stride grid, so the offline forward center-pads
    # (pl, pr) before framing — the streaming path must reproduce that
    # padding, not just frame from sample 0.
    wav = str(tmp_path / "mix.wav")
    write_wav(wav, 0.1 * rng.standard_normal(8002), 8000)

    out_s = str(tmp_path / "out_stream")
    out_o = str(tmp_path / "out_offline")
    separate.main(["--model_path", ckpt, "--input", wav,
                   "--out_dir", out_s, "--streaming_hop", "0.05"])
    separate.main(["--model_path", ckpt, "--input", wav, "--out_dir", out_o])
    for s in range(2):
        a, _ = read_wav(os.path.join(out_s, f"source{s}.wav"))
        b, _ = read_wav(os.path.join(out_o, f"source{s}.wav"))
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= 2.0 / 32768
