"""Checkpoint porting round-trip tests.

Real ultralytics checkpoints aren't available offline, so fidelity is
checked structurally: framework params are exported into an
ultralytics-layout torch-style state_dict (the inverse mapping),
ported back through models/porting.py, and the forwards must match
bit-for-bit. This guards every key path, transpose and block-layout
assumption in the porter; numerical parity vs real checkpoints is a
weights-in-hand exercise (same code path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strongsort_yolo_tpu.models import porting
from strongsort_yolo_tpu.models.yolo import (
    YoloConfig, init_model, model_apply,
)


def _export_conv(sd, prefix, p):
    sd[f"{prefix}.conv.weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    sd[f"{prefix}.bn.weight"] = np.asarray(p["bn_scale"])
    sd[f"{prefix}.bn.bias"] = np.asarray(p["bn_bias"])
    sd[f"{prefix}.bn.running_mean"] = np.asarray(p["bn_mean"])
    sd[f"{prefix}.bn.running_var"] = np.asarray(p["bn_var"])


def _export_conv2d(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _export_bottleneck(sd, prefix, p):
    _export_conv(sd, f"{prefix}.cv1", p["cv1"])
    _export_conv(sd, f"{prefix}.cv2", p["cv2"])


def _export_stage(sd, prefix, p):
    _export_conv(sd, f"{prefix}.cv1", p["cv1"])
    _export_conv(sd, f"{prefix}.cv2", p["cv2"])
    for i, m in enumerate(p["m"]):
        if "c3k" in m:
            c3 = m["c3k"]
            _export_conv(sd, f"{prefix}.m.{i}.cv1", c3["cv1"])
            _export_conv(sd, f"{prefix}.m.{i}.cv2", c3["cv2"])
            _export_conv(sd, f"{prefix}.m.{i}.cv3", c3["cv3"])
            for j, b in enumerate(c3["m"]):
                _export_bottleneck(sd, f"{prefix}.m.{i}.m.{j}", b)
        else:
            _export_bottleneck(sd, f"{prefix}.m.{i}", m)


def _export_branch(sd, prefix, p):
    if "a_dw" in p:
        _export_conv(sd, f"{prefix}.0.0", p["a_dw"])
        _export_conv(sd, f"{prefix}.0.1", p["a"])
        _export_conv(sd, f"{prefix}.1.0", p["b_dw"])
        _export_conv(sd, f"{prefix}.1.1", p["b"])
        _export_conv2d(sd, f"{prefix}.2", p["out"])
    else:
        _export_conv(sd, f"{prefix}.0", p["a"])
        _export_conv(sd, f"{prefix}.1", p["b"])
        _export_conv2d(sd, f"{prefix}.2", p["out"])


def _export_psa(sd, prefix, p):
    _export_conv(sd, f"{prefix}.attn.qkv", p["attn"]["qkv"])
    _export_conv(sd, f"{prefix}.attn.proj", p["attn"]["proj"])
    _export_conv(sd, f"{prefix}.attn.pe", p["attn"]["pe"])
    _export_conv(sd, f"{prefix}.ffn.0", p["ffn1"])
    _export_conv(sd, f"{prefix}.ffn.1", p["ffn2"])


def export_state_dict(params, cfg: YoloConfig) -> dict:
    """Inverse of porting.port_yolo — framework params -> ultralytics
    key layout."""
    lay = porting._LAYOUTS[cfg.family]
    sd: dict = {}
    b = params["backbone"]
    _export_conv(sd, f"model.{lay['stem']}", b["stem"])
    _export_conv(sd, f"model.{lay['down1']}", b["down1"])
    _export_stage(sd, f"model.{lay['stage1']}", b["stage1"])
    _export_conv(sd, f"model.{lay['down2']}", b["down2"])
    _export_stage(sd, f"model.{lay['stage2']}", b["stage2"])
    _export_conv(sd, f"model.{lay['down3']}", b["down3"])
    _export_stage(sd, f"model.{lay['stage3']}", b["stage3"])
    _export_conv(sd, f"model.{lay['down4']}", b["down4"])
    _export_stage(sd, f"model.{lay['stage4']}", b["stage4"])
    _export_conv(sd, f"model.{lay['sppf']}.cv1", b["sppf"]["cv1"])
    _export_conv(sd, f"model.{lay['sppf']}.cv2", b["sppf"]["cv2"])
    if cfg.family == "v11":
        c = b["c2psa"]
        _export_conv(sd, f"model.{lay['c2psa']}.cv1", c["cv1"])
        _export_conv(sd, f"model.{lay['c2psa']}.cv2", c["cv2"])
        for i, m in enumerate(c["m"]):
            _export_psa(sd, f"model.{lay['c2psa']}.m.{i}", m)
    n = params["neck"]
    _export_stage(sd, f"model.{lay['td1']}", n["td1"])
    _export_stage(sd, f"model.{lay['td2']}", n["td2"])
    _export_conv(sd, f"model.{lay['bu1_conv']}", n["bu1_conv"])
    _export_stage(sd, f"model.{lay['bu1']}", n["bu1"])
    _export_conv(sd, f"model.{lay['bu2_conv']}", n["bu2_conv"])
    _export_stage(sd, f"model.{lay['bu2']}", n["bu2"])
    h = f"model.{lay['head']}"
    for i in range(3):
        _export_branch(sd, f"{h}.cv2.{i}", params["detect"]["box"][i])
        _export_branch(sd, f"{h}.cv3.{i}", params["detect"]["cls"][i])
    if cfg.task == "segment":
        for k in ("cv1", "cv2", "cv3"):
            _export_conv(sd, f"{h}.proto.{k}", params["proto"][k])
        for i in range(3):
            _export_branch(sd, f"{h}.cv4.{i}", params["mask"][i])
    elif cfg.task == "pose":
        for i in range(3):
            _export_branch(sd, f"{h}.cv4.{i}", params["kpt"][i])
    return sd


@pytest.mark.parametrize(
    "family,scale,task",
    [("v8", "n", "detect"), ("v11", "n", "detect"), ("v8", "n", "segment"),
     ("v8", "n", "pose")],
)
def test_roundtrip_forward_identical(family, scale, task):
    cfg = YoloConfig(family=family, scale=scale, task=task)
    params = init_model(jax.random.PRNGKey(3), cfg)
    sd = export_state_dict(params, cfg)
    ported = porting.port_yolo(sd, cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    out_a = model_apply(params, x, cfg)
    out_b = model_apply(ported, x, cfg)
    assert set(out_a) == set(out_b)
    for k in out_a:
        np.testing.assert_array_equal(np.asarray(out_a[k]), np.asarray(out_b[k]))


@pytest.mark.parametrize(
    "family,scale,task",
    [("v8", "n", "detect"), ("v8", "s", "detect"), ("v11", "n", "pose"),
     ("v8", "n", "segment")],
)
def test_infer_config(family, scale, task):
    cfg = YoloConfig(family=family, scale=scale, task=task)
    params = init_model(jax.random.PRNGKey(0), cfg)
    sd = export_state_dict(params, cfg)
    got = porting.infer_config(sd, {})
    assert got.family == family
    assert got.scale == scale
    assert got.task == task


def test_npz_checkpoint_roundtrip(tmp_path):
    cfg = YoloConfig(family="v8", scale="n", task="detect")
    params = init_model(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "model.npz")
    porting.save_npz_checkpoint(path, params, cfg, names={0: "person"})
    loaded, cfg2, names = porting.load_npz_checkpoint(path)
    assert cfg2.family == "v8" and cfg2.task == "detect"
    assert names == {0: "person"}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_yolov5_port_roundtrip(rng):
    """v5 (classic + u) porting map: export -> port -> identical fwd."""
    from strongsort_yolo_tpu.models import porting
    from strongsort_yolo_tpu.models.yolov5 import (
        Yolov5Config, init_yolov5, yolov5_apply,
    )

    for anchor_free in (False, True):
        cfg = Yolov5Config(scale="n", anchor_free=anchor_free)
        params = init_yolov5(jax.random.PRNGKey(5), cfg)
        lay = porting._V5_LAYOUT
        sd = {}
        for name in ("stem", "down1", "down2", "down3", "down4",
                     "lat5", "lat4", "bu1_conv", "bu2_conv"):
            _export_conv(sd, f"model.{lay[name]}", params[name])
        for name in ("stage1", "stage2", "stage3", "stage4", "td1",
                     "td2", "bu1", "bu2"):
            p = params[name]
            _export_conv(sd, f"model.{lay[name]}.cv1", p["cv1"])
            _export_conv(sd, f"model.{lay[name]}.cv2", p["cv2"])
            _export_conv(sd, f"model.{lay[name]}.cv3", p["cv3"])
            for i, m in enumerate(p["m"]):
                _export_bottleneck(sd, f"model.{lay[name]}.m.{i}", m)
        _export_conv(sd, f"model.{lay['sppf']}.cv1", params["sppf"]["cv1"])
        _export_conv(sd, f"model.{lay['sppf']}.cv2", params["sppf"]["cv2"])
        h = f"model.{lay['head']}"
        if anchor_free:
            for i in range(3):
                _export_branch(sd, f"{h}.cv2.{i}", params["detect"]["box"][i])
                _export_branch(sd, f"{h}.cv3.{i}", params["detect"]["cls"][i])
        else:
            for i in range(3):
                _export_conv2d(sd, f"{h}.m.{i}", params["detect"]["m"][i])
        got_cfg = porting.infer_v5_config(sd)
        assert got_cfg is not None
        assert got_cfg.anchor_free == anchor_free and got_cfg.scale == "n"
        ported = porting.port_yolov5(sd, cfg)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32
        )
        out_a = yolov5_apply(params, x, cfg)
        out_b = yolov5_apply(ported, x, cfg)
        for k in out_a:
            np.testing.assert_array_equal(
                np.asarray(out_a[k]), np.asarray(out_b[k])
            )
