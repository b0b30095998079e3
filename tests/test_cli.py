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


def test_round3_flags():
    args = build_parser().parse_args(["--track_interval=3", "--int8"])
    cfg = args_to_config(args)
    assert cfg.track_interval == 3 and cfg.int8
    d = args_to_config(build_parser().parse_args([]))
    assert d.track_interval == 1 and not d.int8


def test_every_parser_flag_reaches_the_config():
    """Every parser flag whose dest matches a RunConfig field must be in
    args_to_config's overrides list — a flag that parses but silently
    never reaches the config is a bug (caught live with
    --track_interval in round 3)."""
    import dataclasses

    parser = build_parser()
    fields = {f.name for f in dataclasses.fields(RunConfig)}
    handled_elsewhere = {"mode", "config"}
    base = args_to_config(parser.parse_args([]))
    for action in parser._actions:
        dest = action.dest
        if dest in handled_elsewhere or dest not in fields:
            continue
        if isinstance(base.__getattribute__(dest), bool):
            want = getattr(action, "const", None)
            if want is None or want == base.__getattribute__(dest):
                continue  # flag sets the default value — unobservable
            argv = [action.option_strings[0]]
        elif dest in ("epochs", "learning_rate"):
            argv = [action.option_strings[0], "9", "9"]
            want = (9.0, 9.0) if dest == "learning_rate" else (9, 9)
        elif dest == "multi_scale":
            argv = [action.option_strings[0], "320"]
            want = [320]
        elif dest == "input_size":
            argv = [f"{action.option_strings[0]}=64"]
            want = (64, 64)
        elif action.type is int:
            argv = [f"{action.option_strings[0]}=9"]
            want = 9
        elif action.type is float:
            argv = [f"{action.option_strings[0]}=0.125"]
            want = 0.125
        elif getattr(action, "choices", None):
            choice = sorted(action.choices)[0]
            argv = [f"{action.option_strings[0]}={choice}"]
            want = choice
        else:
            argv = [f"{action.option_strings[0]}=XVAL"]
            want = "XVAL"
        cfg = args_to_config(parser.parse_args(argv))
        assert cfg.__getattribute__(dest) == want, (
            f"flag {action.option_strings[0]} (dest={dest}) does not "
            "reach the RunConfig — add it to args_to_config")


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


def test_int8_calibration_sources(tmp_path, rng):
    """_int8_kw pulls calibration pixels from text annotation lists AND
    TFRecord shards (and falls back to None with no dataset)."""
    import io

    from PIL import Image

    from yoloret_tpu.cli.main import _int8_kw
    from yoloret_tpu.data.tfrecord import Example, TFRecordWriter

    img = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
    jp = tmp_path / "a.jpg"
    Image.fromarray(img).save(jp)
    ann = tmp_path / "list.txt"
    ann.write_text(f"{jp} 1,2,30,40,0\n")

    rp = tmp_path / "train_0.tfrecord"
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    with TFRecordWriter(str(rp)) as w:
        w.write(Example({"image/encoded": buf.getvalue()}).serialize())

    base = RunConfig(int8=True, input_size=(64, 64), quantize_samples=4)
    for src in (str(ann), str(rp)):
        kw = _int8_kw(base.replace(test_dataset=src))
        assert kw["use_int8"]
        assert kw["calibration_images"].shape == (1, 64, 64, 3)
    kw = _int8_kw(base)
    assert kw["use_int8"] and kw["calibration_images"] is None
    assert _int8_kw(RunConfig()) == {}
