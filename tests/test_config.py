import argparse

import pytest

from hairci.utils.config import (
    build_pretrain_parser,
    parse_pretrain_args,
)


def test_defaults_match_reference_surface():
    args = parse_pretrain_args([])
    # reference defaults (`mainpretrain.py:34-83`)
    assert args.epochs == 20 and args.batch_size == 32
    assert args.mode == "simclr_supcon" and args.model == "resnet18"
    assert args.temp == 0.5 and args.lr == 0.001
    assert args.warm_up_epochs == 20 and args.ema == 0.99 and args.k == 15
    assert args.ablation == "None"


def test_all_reference_modes_parse():
    for mode in ["mae", "simclr", "simclr_supcon", "dinov2", "simMIM",
                 "SHAM", "S2R2", "DenseCL", "MSN", "BYOL"]:
        args = parse_pretrain_args(["--mode", mode])
        assert args.mode == mode


def test_yaml_overrides_defaults_but_not_cli(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("epochs: 99\nlr: 0.5\nmode: simclr\n")
    a = parse_pretrain_args(["--config", str(cfg)])
    assert a.epochs == 99 and a.lr == 0.5 and a.mode == "simclr"
    # explicit CLI wins over YAML (both --flag val and --flag=val forms)
    a = parse_pretrain_args(["--config", str(cfg), "--epochs", "7"])
    assert a.epochs == 7 and a.lr == 0.5
    a = parse_pretrain_args(["--config", str(cfg), "--epochs=3"])
    assert a.epochs == 3


def test_yaml_unknown_keys_ignored(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("nonexistent_flag: 1\nepochs: 5\n")
    a = parse_pretrain_args(["--config", str(cfg)])
    assert a.epochs == 5
    assert not hasattr(a, "nonexistent_flag")


def test_invalid_choices_rejected():
    with pytest.raises(SystemExit):
        build_pretrain_parser().parse_args(["--mode", "bogus"])
    with pytest.raises(SystemExit):
        build_pretrain_parser().parse_args(["--k", "4"])  # choices 3/5/7/11/15
