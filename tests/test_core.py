import dataclasses

import pytest

from kaldi_cnn_tpu.core.config import (
    apply_overrides, asdict_flat, configclass, parse_cli)


@configclass
class Inner:
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 23


@configclass
class Outer:
    beam: float = 15.0
    use_energy: bool = False
    frame_opts: Inner = None

    def __post_init__(self):
        if self.frame_opts is None:
            self.frame_opts = Inner()


def test_defaults_and_overrides():
    cfg = parse_cli(Outer, ["--beam=10", "--use-energy=true",
                            "--frame-opts.num-mel-bins=40"])
    assert cfg.beam == 10.0
    assert cfg.use_energy is True
    assert cfg.frame_opts.num_mel_bins == 40
    assert cfg.frame_opts.frame_shift_ms == 10.0


def test_space_separated_and_flat():
    cfg = parse_cli(Outer, ["--beam", "8.5"])
    assert cfg.beam == 8.5
    flat = asdict_flat(cfg)
    assert flat["frame_opts.num_mel_bins"] == 23


def test_unknown_option_raises():
    with pytest.raises(KeyError):
        parse_cli(Outer, ["--nope=1"])


def test_config_file(tmp_path):
    p = tmp_path / "fbank.conf"
    p.write_text("--frame-opts.num-mel-bins=36\n# comment\n--beam=12\n")
    cfg = parse_cli(Outer, [f"--config={p}"])
    assert cfg.frame_opts.num_mel_bins == 36
    assert cfg.beam == 12.0


def test_accu_profile_and_step_timer():
    import time as _time
    from kaldi_cnn_tpu.core.profiling import (
        StepTimer, accu_profile, print_profile)
    with accu_profile("unit_stage"):
        _time.sleep(0.01)
    with accu_profile("unit_stage"):
        _time.sleep(0.01)
    prof = print_profile(reset=True)
    assert prof["unit_stage"]["calls"] == 2
    assert prof["unit_stage"]["total_s"] >= 0.02
    st = StepTimer(frames_per_step=512)
    for _ in range(3):
        st.tic()
        _time.sleep(0.005)
        st.toc()
    s = st.summary()
    assert s["steps"] == 3
    assert s["audio_seconds_per_sec"] > 0
