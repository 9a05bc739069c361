"""Config-system tests: .ini compatibility with the reference's key set,
xname templating, typed getters, and model construction from the shipped
flagship configs (reference: nlt/util/config.py, nlt/trainvali.py:59-71,
nlt/config/dragon_specular.ini)."""

import os
from os.path import join

import pytest

from nlt_tpu.models import get_model_class
from nlt_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_DIR = join(REPO, "nlt_tpu", "config")


def test_typed_getters():
    c = Config({"a": "3", "b": "2.5", "c": "True", "d": "none",
                "e": "x,y , z"})
    assert c.get_int("a") == 3
    assert c.get_float("b") == 2.5
    assert c.get_bool("c") is True
    assert c.get_or_none("d") is None
    assert c.get_list("e") == ["x", "y", "z"]
    assert c.get("missing", "dflt") == "dflt"
    with pytest.raises(KeyError):
        c.get("missing")


def test_xname_templating():
    c = Config({"lr": "1e-3", "depth": "256",
                "xname": "exp_lr:{lr}_depth:{depth}"})
    assert c.xname() == "exp_lr:1e-3_depth:256"


def test_ini_roundtrip(tmp_path):
    c = Config({"foo": "bar", "n": 7})
    p = str(tmp_path / "t.ini")
    c.save(p)
    c2 = Config.from_ini(p)
    assert c2.get("foo") == "bar" and c2.get_int("n") == 7


@pytest.mark.parametrize("ini", [
    "dragon_specular.ini", "dragon_sss.ini", "sphere_synthetic.ini",
    "sphere_relight_identity.ini", "sphere_viewsyn.ini"])
def test_shipped_configs_build_models(ini):
    """Every shipped config parses and constructs the full model
    (networks + losses) — catching key drift against the reference's
    recipe key set."""
    c = Config.from_ini(join(CFG_DIR, ini))
    # Required reference keys all present
    for key in ("dataset", "model", "loss", "bs", "lr", "epochs",
                "ckpt_period", "vali_period", "imh", "imw", "uvh", "uvw",
                "holdout_cam", "holdout_light", "use_obs",
                "skip_connect_base", "depth0", "depth", "kernel",
                "stride", "norm", "act", "pool", "xname", "outroot",
                "data_root", "overwrite", "linear_space"):
        assert c.has(key), "%s missing %s" % (ini, key)
    model = get_model_class(c.get("model"))(c)
    assert len(model.net["query"].stages) > len(model.net["obs"].stages)
    # dragon recipes: depth0 16, kernel 2, stride 2
    if ini.startswith("dragon"):
        assert c.get_int("depth0") == 16
        assert c.get_int("kernel") == 2 and c.get_int("stride") == 2
        assert c.get("loss") == "barron,1e+0lpips"


def test_reference_format_ini_parses(tmp_path):
    """An .ini written in the reference's exact format (single [DEFAULT],
    same key spellings) loads unchanged."""
    ini = tmp_path / "ref_style.ini"
    ini.write_text("""[DEFAULT]
dataset = nlt
no_batch = False
bs = 4
cache = False
model = nlt
loss = barron,1e+0lpips
lr = 1e-3
mgm = -1
epochs = 100
ckpt_period = 1
vali_period = 1
vis_train_batches = 4
vali_batches = -1
keep_recent_epochs = -1
overwrite = True
outroot = /tmp/out/
xname = specular_lr:{lr}_mgm:{mgm}_depth:{depth}
imh = 128
imw = 128
uvh = 128
uvw = 128
data_root = /tmp/data/
holdout_cam = C28C,P08L,P11L,C27
holdout_light = L073,L101,L140,L303
linear_space = False
use_obs = True
skip_connect_base = True
depth0 = 16
depth = 256
kernel = 2
stride = 2
norm = None
act = leakyrelu
pool = None
""")
    c = Config.from_ini(str(ini))
    assert c.get_list("holdout_cam") == ["C28C", "P08L", "P11L", "C27"]
    assert c.get_or_none("norm") is None
    assert c.xname() == "specular_lr:1e-3_mgm:-1_depth:256"
    model = get_model_class("nlt")(c)
    assert model.uvh == 128
