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


# ---------------------------------------------------------------------------
# YOLOv7 porting (official layout incl. IDetect implicit folding)
# ---------------------------------------------------------------------------


def _export_v7_repconv(sd, i, p):
    for theirs, ours in (("rbr_dense", "dense"), ("rbr_1x1", "one")):
        q = p[ours]
        sd[f"model.{i}.{theirs}.0.weight"] = np.transpose(
            np.asarray(q["w"]), (3, 2, 0, 1)
        )
        sd[f"model.{i}.{theirs}.1.weight"] = np.asarray(q["bn_scale"])
        sd[f"model.{i}.{theirs}.1.bias"] = np.asarray(q["bn_bias"])
        sd[f"model.{i}.{theirs}.1.running_mean"] = np.asarray(q["bn_mean"])
        sd[f"model.{i}.{theirs}.1.running_var"] = np.asarray(q["bn_var"])


def export_v7_state_dict(params, rng, with_implicit=True):
    """Inverse of porting.port_yolov7, fabricating random IDetect
    implicit layers: the exported conv weights are chosen so that the
    porter's ia/im fold reproduces the framework params exactly."""
    from strongsort_yolo_tpu.models.yolov7 import V7_ANCHORS

    ix = porting._V7_IDX
    sd = {}
    for name in ("stem0", "stem1", "stem2", "down2", "lat4", "route4",
                 "lat3", "route3"):
        _export_conv(sd, f"model.{ix[name]}", params[name])
    for name in ("elan2", "elan3", "elan4", "elan5", "elan_h4", "elan_h3",
                 "elan_h4b", "elan_h5"):
        cv1, cv2, inner, merge = ix[name]
        p = params[name]
        _export_conv(sd, f"model.{cv1}", p["cv1"])
        _export_conv(sd, f"model.{cv2}", p["cv2"])
        for j, q in zip(inner, p["inner"]):
            _export_conv(sd, f"model.{j}", q)
        _export_conv(sd, f"model.{merge}", p["merge"])
    for name in ("mp3", "mp4", "mp5", "mp_h4", "mp_h5"):
        a, b, c = ix[name]
        p = params[name]
        _export_conv(sd, f"model.{a}", p["cv1"])
        _export_conv(sd, f"model.{b}", p["cv2"])
        _export_conv(sd, f"model.{c}", p["cv3"])
    for k in ("cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv7"):
        _export_conv(sd, f"model.{ix['sppcspc']}.{k}", params["sppcspc"][k])
    for name in ("rep3", "rep4", "rep5"):
        _export_v7_repconv(sd, ix[name], params[name])
    h = ix["detect"]
    for j in range(3):
        q = params["detect"]["m"][j]
        w_t = np.transpose(np.asarray(q["w"]), (3, 2, 0, 1))  # OIHW target
        b_t = np.asarray(q["b"]).astype(np.float64)
        if with_implicit:
            no, c = w_t.shape[:2]
            ia = rng.normal(0, 0.02, (1, c, 1, 1)).astype(np.float64)
            im = rng.uniform(0.8, 1.2, (1, no, 1, 1)).astype(np.float64)
            # unfold: exported (W_e, b_e) such that folding ia/im
            # reproduces (w_t, b_t)
            w_e = w_t.astype(np.float64) / im.reshape(-1, 1, 1, 1)
            b_e = b_t / im.reshape(-1) - w_e.reshape(no, -1) @ ia.reshape(-1)
            sd[f"model.{h}.ia.{j}.implicit"] = ia.astype(np.float32)
            sd[f"model.{h}.im.{j}.implicit"] = im.astype(np.float32)
            sd[f"model.{h}.m.{j}.weight"] = w_e.astype(np.float32)
            sd[f"model.{h}.m.{j}.bias"] = b_e.astype(np.float32)
        else:
            sd[f"model.{h}.m.{j}.weight"] = w_t
            sd[f"model.{h}.m.{j}.bias"] = b_t.astype(np.float32)
    sd[f"model.{h}.anchor_grid"] = np.asarray(V7_ANCHORS, np.float32).reshape(
        3, 1, 3, 1, 1, 2
    )
    return sd


@pytest.mark.parametrize("with_implicit", [True, False])
def test_yolov7_port_roundtrip(rng, with_implicit):
    from strongsort_yolo_tpu.models.yolov7 import (
        Yolov7Config, init_yolov7, yolov7_apply,
    )

    cfg = Yolov7Config()
    params = init_yolov7(jax.random.PRNGKey(7), cfg)
    sd = export_v7_state_dict(params, rng, with_implicit=with_implicit)
    got_cfg = porting.infer_v7_config(sd)
    assert got_cfg is not None and got_cfg.nc == 80
    # v7 must win the family dispatch
    assert porting.infer_v5_config(sd) is None
    ported = porting.port_yolov7(sd, cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    out_a = yolov7_apply(params, x, cfg)
    out_b = yolov7_apply(ported, x, cfg)
    tol = dict(rtol=2e-5, atol=2e-5) if with_implicit else dict(rtol=0, atol=0)
    for k in out_a:
        np.testing.assert_allclose(
            np.asarray(out_a[k]), np.asarray(out_b[k]), **tol
        )


def test_yolov7_port_deployed_repconv(rng):
    """Deployed checkpoints carry a single rbr_reparam conv; porting
    must map it straight onto the fused form."""
    from strongsort_yolo_tpu.models.yolov7 import (
        Yolov7Config, fuse_yolov7, init_yolov7, yolov7_apply,
    )

    cfg = Yolov7Config()
    params = init_yolov7(jax.random.PRNGKey(8), cfg)
    fused = fuse_yolov7(params)
    sd = export_v7_state_dict(params, rng, with_implicit=False)
    for name in ("rep3", "rep4", "rep5"):
        i = porting._V7_IDX[name]
        for key in list(sd):
            if key.startswith(f"model.{i}.rbr_"):
                del sd[key]
        fp = fused[name]["fused"]
        sd[f"model.{i}.rbr_reparam.weight"] = np.transpose(
            np.asarray(fp["w"]), (3, 2, 0, 1)
        )
        sd[f"model.{i}.rbr_reparam.bias"] = np.asarray(fp["b"])
    ported = porting.port_yolov7(sd, cfg)
    assert "fused" in ported["rep3"]
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    out_a = yolov7_apply(fuse_yolov7(params), x, cfg)
    out_b = yolov7_apply(porting.port_yolov7(sd, cfg), x, cfg)
    # same rep weights; remaining convs unfused vs fused BN folding
    # differ by float assoc only at BN-fold sites — compare rep output
    # through full forward with loose tol
    np.testing.assert_allclose(
        np.asarray(out_a["boxes"]), np.asarray(out_b["boxes"]),
        rtol=1e-3, atol=1e-3,
    )


# ---------------------------------------------------------------------------
# OSNet porting (torchreid layout)
# ---------------------------------------------------------------------------


def _export_os_lite(sd, prefix, p):
    sd[f"{prefix}.conv1.weight"] = np.transpose(np.asarray(p["pw"]["w"]), (3, 2, 0, 1))
    sd[f"{prefix}.conv2.weight"] = np.transpose(np.asarray(p["dw"]["w"]), (3, 2, 0, 1))
    dw = p["dw"]
    sd[f"{prefix}.bn.weight"] = np.asarray(dw["bn_scale"])
    sd[f"{prefix}.bn.bias"] = np.asarray(dw["bn_bias"])
    sd[f"{prefix}.bn.running_mean"] = np.asarray(dw["bn_mean"])
    sd[f"{prefix}.bn.running_var"] = np.asarray(dw["bn_var"])


def _export_os_block(sd, prefix, p):
    _export_conv(sd, f"{prefix}.conv1", p["conv1"])
    _export_conv(sd, f"{prefix}.conv3", p["conv3"])
    if "down" in p:
        _export_conv(sd, f"{prefix}.downsample", p["down"])
    _export_conv2d(sd, f"{prefix}.gate.fc1", p["gate"]["fc1"])
    _export_conv2d(sd, f"{prefix}.gate.fc2", p["gate"]["fc2"])
    names = ["conv2a", "conv2b", "conv2c", "conv2d"]
    for name, convs in zip(names, p["streams"]):
        if len(convs) == 1:
            _export_os_lite(sd, f"{prefix}.{name}", convs[0])
        else:
            for j, cp in enumerate(convs):
                _export_os_lite(sd, f"{prefix}.{name}.{j}", cp)


def export_osnet_state_dict(params):
    """Inverse of porting.port_osnet — framework params -> torchreid
    key layout."""
    sd = {}
    _export_conv(sd, "conv1", params["stem"])
    for ours, theirs in porting._OSNET_STAGES.items():
        if ours.startswith("t"):
            _export_conv(sd, theirs, params[ours])
        else:
            _export_os_block(sd, theirs, params[ours])
    _export_conv(sd, "conv5", params["conv5"])
    fc = params["fc"]
    sd["fc.0.weight"] = np.asarray(fc["lin"]["w"])[0, 0].T
    sd["fc.0.bias"] = np.asarray(fc["lin"]["b"])
    sd["fc.1.weight"] = np.asarray(fc["bn"]["bn_scale"])
    sd["fc.1.bias"] = np.asarray(fc["bn"]["bn_bias"])
    sd["fc.1.running_mean"] = np.asarray(fc["bn"]["bn_mean"])
    sd["fc.1.running_var"] = np.asarray(fc["bn"]["bn_var"])
    return sd


def test_osnet_port_roundtrip():
    from strongsort_yolo_tpu.models.osnet import (
        OsnetConfig, init_osnet, osnet_apply,
    )

    cfg = OsnetConfig(variant="osnet_x0_25")
    params = init_osnet(jax.random.PRNGKey(9), cfg)
    sd = export_osnet_state_dict(params)
    got = porting.infer_osnet_config(sd)
    assert got is not None
    assert got.variant == "osnet_x0_25" and got.feat_dim == 512
    ported = porting.port_osnet(sd)
    crops = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (4, 128, 64, 3)), jnp.float32
    )
    a = osnet_apply(params, crops)
    b = osnet_apply(ported, crops)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # embeddings are unit-norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=1), 1.0, atol=1e-5)
