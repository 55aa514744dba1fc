"""Config system: key=value files layered under CLI flags."""

from faster_rcnn_pytorch_tpu.config import load_options, parse_config_file


def test_defaults():
    opts = load_options([])
    assert opts.data_type == "voc"
    assert opts.lr == 1e-3
    assert opts.scheduler == "cosine"


def test_config_file_layering(tmp_path):
    cfg = tmp_path / "run.txt"
    cfg.write_text(
        """
# comment
name = exp1
data_type = coco
lr = 2e-3
epoch = 26
mosaic_transform = true
milestones = 16,22
"""
    )
    opts = load_options(["--config", str(cfg)])
    assert opts.name == "exp1"
    assert opts.data_type == "coco"
    assert opts.lr == 2e-3
    assert opts.epoch == 26
    assert opts.mosaic_transform is True
    assert tuple(opts.milestones) == (16, 22)


def test_cli_overrides_config(tmp_path):
    cfg = tmp_path / "run.txt"
    cfg.write_text("lr = 2e-3\nname = fromfile\n")
    opts = load_options(["--config", str(cfg), "--lr", "5e-4"])
    assert opts.lr == 5e-4
    assert opts.name == "fromfile"


def test_reference_config_files_parse():
    for f in (
        "configs/voc_train.txt",
        "configs/coco_train.txt",
        "configs/coco_fpn_train.txt",
        "configs/coco_plus_train.txt",
    ):
        opts = load_options(["--config", f])
        assert opts.name
        assert opts.model_generation in ("legacy", "fpn")


def test_parse_config_file_colon_style(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("name: alt\n--lr: 1e-2\n")
    kv = parse_config_file(str(cfg))
    assert kv["name"] == "alt"
    assert kv["lr"] == "1e-2"
