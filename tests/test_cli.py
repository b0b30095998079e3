"""CLI surface tests: flag parsing, config overlay, mode dispatch edges."""

import numpy as np
import pytest

from yoloret_tpu.cli.main import args_to_config, build_parser, main
from yoloret_tpu.configs import RunConfig, load_config


def test_defaults_match_runconfig():
    args = build_parser().parse_args([])
    cfg = args_to_config(args)
    assert cfg == RunConfig()


def test_flag_overrides():
    args = build_parser().parse_args(
        ["--backbone=efficientnetb3", "--input_size=416", "--epochs", "5", "7",
         "--learning_rate", "0.01", "0.002", "--batch_size=64", "--use_ema"]
    )
    cfg = args_to_config(args)
    assert cfg.backbone == "efficientnetb3"
    assert cfg.input_size == (416, 416)
    assert cfg.epochs == (5, 7)
    assert cfg.learning_rate == (0.01, 0.002)
    assert cfg.batch_size == 64 and cfg.use_ema


def test_round2_flags():
    args = build_parser().parse_args(
        ["--early_stopping", "--early_stopping_patience=7", "--map_every=5",
         "--tb_images=2", "--exact_nms", "--autoaugment_policy=v2"]
    )
    cfg = args_to_config(args)
    assert cfg.early_stopping and cfg.early_stopping_patience == 7
    assert cfg.map_every == 5 and cfg.tb_images == 2
    assert cfg.exact_nms
    assert cfg.autoaugment_policy == "v2"
    # all default off
    d = args_to_config(build_parser().parse_args([]))
    assert not d.early_stopping and d.map_every == 0
    assert d.tb_images == 0 and not d.exact_nms


def test_rectangular_input_size():
    args = build_parser().parse_args(["--input_size=320,416"])
    assert args_to_config(args).input_size == (320, 416)


def test_train_unfreeze_implies_stage2():
    args = build_parser().parse_args(["--train_unfreeze=/w"])
    cfg = args_to_config(args)
    assert cfg.freeze is False and cfg.train_unfreeze == "/w"


def test_yaml_overlay_and_cli_priority(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("backbone: efficientnetb0\nbatch_size: 99\n")
    args = build_parser().parse_args([f"--config={y}", "--batch_size=7"])
    cfg = args_to_config(args)
    assert cfg.backbone == "efficientnetb0"  # from yaml
    assert cfg.batch_size == 7  # cli wins


def test_yaml_unknown_key_raises(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("not_a_field: 1\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(str(y))


def test_unknown_mode_exits_2(capsys):
    assert main(["--mode=BOGUS"]) == 2
    assert "unknown mode" in capsys.readouterr().err


def test_prune_mode_reports(capsys):
    assert main(["--mode=PRUNE"]) == 2
    assert "not implemented" in capsys.readouterr().out


def test_video_requires_source(capsys):
    assert main(["--mode=VIDEO"]) == 2


def test_explicit_flag_equal_to_default_beats_yaml(tmp_path):
    """Regression: --batch_size 8 (the built-in default) must override a
    YAML value; previously only flags differing from the default won."""
    y = tmp_path / "c.yaml"
    y.write_text("batch_size: 32\nfreeze: false\n")
    cfg = args_to_config(build_parser().parse_args([f"--config={y}", "--batch_size=8"]))
    assert cfg.batch_size == 8
    assert cfg.freeze is False  # yaml survives where no flag given
    cfg2 = args_to_config(build_parser().parse_args([f"--config={y}", "--freeze"]))
    assert cfg2.freeze is True  # explicit --freeze beats yaml false
