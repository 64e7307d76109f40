"""Checkpoint porting: ultralytics-format torch ``.pt`` -> JAX params.

The reference loads pretrained ultralytics checkpoints by filename
(/root/reference/yolo_multi_model.py:14-17, SURVEY.md D1); this module
gives the rebuilt framework the same capability without importing (or
having) the ultralytics package: the pickle inside the ``.pt`` is
opened with a stub module factory that fabricates any missing
``ultralytics.*`` class as a bare ``torch.nn.Module`` subclass, which
is enough for torch to reconstruct the module tree and yield a clean
``state_dict`` of plain tensors.

Key mapping: ultralytics models are an ``nn.Sequential`` whose indices
follow the yaml layer order; ``_LAYOUTS`` maps those indices onto this
framework's named param tree (models/yolo.py), and the block-level
porters transpose conv kernels OIHW -> HWIO (NHWC layout).

SURVEY.md §7 hard part #4 — per-layer fidelity is covered by
tests/test_porting.py: a reference-shaped torch state_dict is
fabricated, ported, and the JAX forward is compared against a
torch-free NumPy re-execution oracle of the same weights.
"""

from __future__ import annotations

import sys
import types
from typing import Any

import numpy as np

from strongsort_yolo_tpu.models.yolo import YoloConfig

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Loading the torch pickle without ultralytics installed
# ---------------------------------------------------------------------------


def _install_ultralytics_stubs():
    """Fabricate importable ultralytics.* modules whose attributes are
    bare nn.Module subclasses (or simple containers), so the checkpoint
    pickle reconstructs."""
    import torch

    class _StubNamespace(dict):
        def __getattr__(self, k):
            return self.get(k)

        def __setattr__(self, k, v):
            self[k] = v

    def make_class(name):
        if name in ("IterableSimpleNamespace", "SimpleNamespace"):
            return _StubNamespace
        return type(name, (torch.nn.Module,), {"__module__": "ultralytics_stub"})

    class StubModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            # submodule path or class? classes are CamelCase by convention
            if name[:1].isupper():
                cls = make_class(name)
                setattr(self, name, cls)
                return cls
            sub = StubModule(f"{self.__name__}.{name}")
            sys.modules[sub.__name__] = sub
            setattr(self, name, sub)
            return sub

    if "ultralytics" not in sys.modules or not isinstance(
        sys.modules["ultralytics"], StubModule
    ):
        try:
            import ultralytics  # noqa: F401  (real package wins if present)

            return
        except ImportError:
            pass
        root = StubModule("ultralytics")
        sys.modules["ultralytics"] = root


def load_torch_checkpoint(path: str):
    """-> (state_dict {key: np.ndarray}, meta {names, nc, yaml, task})."""
    import torch

    _install_ultralytics_stubs()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(model, "state_dict"):
        sd = model.state_dict()
    elif isinstance(model, dict):
        sd = model
    else:
        raise ValueError(f"unrecognized checkpoint structure in {path}")
    state = {
        k: v.detach().float().cpu().numpy()
        for k, v in sd.items()
        if hasattr(v, "detach")
    }
    meta = {}
    for attr in ("names", "yaml", "args"):
        v = getattr(model, attr, None)
        if v is not None:
            meta[attr] = dict(v) if hasattr(v, "keys") else v
    return state, meta


# ---------------------------------------------------------------------------
# Torch-layout -> framework param tree
# ---------------------------------------------------------------------------


def _conv(sd, prefix):
    """ultralytics Conv (conv + bn): -> framework conv params."""
    w = sd[f"{prefix}.conv.weight"]
    p = {"w": np.transpose(w, (2, 3, 1, 0))}
    if f"{prefix}.bn.weight" in sd:
        p["bn_scale"] = sd[f"{prefix}.bn.weight"]
        p["bn_bias"] = sd[f"{prefix}.bn.bias"]
        p["bn_mean"] = sd[f"{prefix}.bn.running_mean"]
        p["bn_var"] = sd[f"{prefix}.bn.running_var"]
    elif f"{prefix}.conv.bias" in sd:
        p["b"] = sd[f"{prefix}.conv.bias"]
    return p


def _conv2d(sd, prefix):
    """bare nn.Conv2d with bias (head output layers)."""
    return {
        "w": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0)),
        "b": sd[f"{prefix}.bias"],
    }


def _bottleneck(sd, prefix):
    return {"cv1": _conv(sd, f"{prefix}.cv1"), "cv2": _conv(sd, f"{prefix}.cv2")}


def _c2f(sd, prefix):
    n = 0
    while f"{prefix}.m.{n}.cv1.conv.weight" in sd:
        n += 1
    return {
        "cv1": _conv(sd, f"{prefix}.cv1"),
        "cv2": _conv(sd, f"{prefix}.cv2"),
        "m": [_bottleneck(sd, f"{prefix}.m.{i}") for i in range(n)],
    }


def _c3(sd, prefix):
    n = 0
    while f"{prefix}.m.{n}.cv1.conv.weight" in sd:
        n += 1
    return {
        "cv1": _conv(sd, f"{prefix}.cv1"),
        "cv2": _conv(sd, f"{prefix}.cv2"),
        "cv3": _conv(sd, f"{prefix}.cv3"),
        "m": [_bottleneck(sd, f"{prefix}.m.{i}") for i in range(n)],
    }


def _c3k2(sd, prefix):
    n = 0
    inner = []
    while True:
        if f"{prefix}.m.{n}.cv3.conv.weight" in sd:  # C3k unit
            inner.append({"c3k": _c3(sd, f"{prefix}.m.{n}")})
        elif f"{prefix}.m.{n}.cv1.conv.weight" in sd:  # plain bottleneck
            inner.append(_bottleneck(sd, f"{prefix}.m.{n}"))
        else:
            break
        n += 1
    return {
        "cv1": _conv(sd, f"{prefix}.cv1"),
        "cv2": _conv(sd, f"{prefix}.cv2"),
        "m": inner,
    }


def _sppf(sd, prefix):
    return {"cv1": _conv(sd, f"{prefix}.cv1"), "cv2": _conv(sd, f"{prefix}.cv2")}


def _psa_block(sd, prefix):
    return {
        "attn": {
            "qkv": _conv(sd, f"{prefix}.attn.qkv"),
            "proj": _conv(sd, f"{prefix}.attn.proj"),
            "pe": _conv(sd, f"{prefix}.attn.pe"),
        },
        "ffn1": _conv(sd, f"{prefix}.ffn.0"),
        "ffn2": _conv(sd, f"{prefix}.ffn.1"),
    }


def _c2psa(sd, prefix):
    n = 0
    while f"{prefix}.m.{n}.attn.qkv.conv.weight" in sd:
        n += 1
    return {
        "cv1": _conv(sd, f"{prefix}.cv1"),
        "cv2": _conv(sd, f"{prefix}.cv2"),
        "m": [_psa_block(sd, f"{prefix}.m.{i}") for i in range(n)],
    }


def _branch(sd, prefix):
    """Detect tower: Conv, Conv, Conv2d (v8) or the v11 depthwise cls
    tower Sequential(Sequential(DWConv, Conv), Sequential(DWConv,
    Conv), Conv2d)."""
    if f"{prefix}.0.0.conv.weight" in sd:  # v11 dw tower
        return {
            "a_dw": _conv(sd, f"{prefix}.0.0"),
            "a": _conv(sd, f"{prefix}.0.1"),
            "b_dw": _conv(sd, f"{prefix}.1.0"),
            "b": _conv(sd, f"{prefix}.1.1"),
            "out": _conv2d(sd, f"{prefix}.2"),
        }
    return {
        "a": _conv(sd, f"{prefix}.0"),
        "b": _conv(sd, f"{prefix}.1"),
        "out": _conv2d(sd, f"{prefix}.2"),
    }


def _stage(sd, prefix, family):
    return _c2f(sd, prefix) if family == "v8" else _c3k2(sd, prefix)


# layer-index layout per family: name -> sequential index
_LAYOUTS = {
    "v8": {
        "stem": 0, "down1": 1, "stage1": 2, "down2": 3, "stage2": 4,
        "down3": 5, "stage3": 6, "down4": 7, "stage4": 8, "sppf": 9,
        "td1": 12, "td2": 15, "bu1_conv": 16, "bu1": 18,
        "bu2_conv": 19, "bu2": 21, "head": 22,
    },
    "v11": {
        "stem": 0, "down1": 1, "stage1": 2, "down2": 3, "stage2": 4,
        "down3": 5, "stage3": 6, "down4": 7, "stage4": 8, "sppf": 9,
        "c2psa": 10,
        "td1": 13, "td2": 16, "bu1_conv": 17, "bu1": 19,
        "bu2_conv": 20, "bu2": 22, "head": 23,
    },
}


def port_yolo(state_dict: dict, cfg: YoloConfig) -> Params:
    """Map an ultralytics v8/v11 state_dict onto the framework tree."""
    sd = state_dict
    lay = _LAYOUTS[cfg.family]
    pre = "model"

    def L(name):
        return f"{pre}.{lay[name]}"

    backbone = {
        "stem": _conv(sd, L("stem")),
        "down1": _conv(sd, L("down1")),
        "stage1": _stage(sd, L("stage1"), cfg.family),
        "down2": _conv(sd, L("down2")),
        "stage2": _stage(sd, L("stage2"), cfg.family),
        "down3": _conv(sd, L("down3")),
        "stage3": _stage(sd, L("stage3"), cfg.family),
        "down4": _conv(sd, L("down4")),
        "stage4": _stage(sd, L("stage4"), cfg.family),
        "sppf": _sppf(sd, L("sppf")),
    }
    if cfg.family == "v11":
        backbone["c2psa"] = _c2psa(sd, L("c2psa"))
    neck = {
        "td1": _stage(sd, L("td1"), cfg.family),
        "td2": _stage(sd, L("td2"), cfg.family),
        "bu1_conv": _conv(sd, L("bu1_conv")),
        "bu1": _stage(sd, L("bu1"), cfg.family),
        "bu2_conv": _conv(sd, L("bu2_conv")),
        "bu2": _stage(sd, L("bu2"), cfg.family),
    }
    h = L("head")
    detect = {
        "box": [_branch(sd, f"{h}.cv2.{i}") for i in range(3)],
        "cls": [_branch(sd, f"{h}.cv3.{i}") for i in range(3)],
    }
    params: Params = {"backbone": backbone, "neck": neck, "detect": detect}
    if cfg.task == "segment":
        params["proto"] = {
            "cv1": _conv(sd, f"{h}.proto.cv1"),
            "cv2": _conv(sd, f"{h}.proto.cv2"),
            "cv3": _conv(sd, f"{h}.proto.cv3"),
        }
        params["mask"] = [_branch(sd, f"{h}.cv4.{i}") for i in range(3)]
    elif cfg.task == "pose":
        params["kpt"] = [_branch(sd, f"{h}.cv4.{i}") for i in range(3)]

    import jax.numpy as jnp
    import jax

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def infer_config(state_dict: dict, meta: dict) -> YoloConfig:
    """Detect family/scale/task from checkpoint structure."""
    keys = state_dict.keys()
    family = "v11" if any(".attn.qkv" in k for k in keys) else "v8"
    head = _LAYOUTS[family]["head"]
    task = "detect"
    if f"model.{head}.proto.cv1.conv.weight" in keys:
        task = "segment"
    elif f"model.{head}.cv4.0.0.conv.weight" in keys:
        task = "pose"
    stem_out = state_dict["model.0.conv.weight"].shape[0]
    # width multiple from the stem (64 * w), then disambiguate by depth
    w_to_scales = {
        "v8": {16: ["n"], 32: ["s"], 48: ["m"], 64: ["l"], 80: ["x"]},
        "v11": {16: ["n"], 32: ["s"], 64: ["m", "l"], 96: ["x"]},
    }
    cands = w_to_scales[family].get(stem_out, ["n"])
    if len(cands) > 1:  # v11 m vs l: depth differs (stage repeats)
        n_rep = 0
        while f"model.2.m.{n_rep}.cv1.conv.weight" in keys or (
            f"model.2.m.{n_rep}.cv3.conv.weight" in keys
        ):
            n_rep += 1
        scale = "l" if n_rep > 1 else "m"
    else:
        scale = cands[0]
    nc = None
    if isinstance(meta.get("names"), dict):
        nc = len(meta["names"])
    if nc is None:
        cls_w = state_dict.get(f"model.{head}.cv3.0.2.weight")
        nc = cls_w.shape[0] if cls_w is not None else 80
    kpt = (17, 3)
    if task == "pose":
        nk = state_dict[f"model.{head}.cv4.0.2.weight"].shape[0]
        kpt = (nk // 3, 3) if nk % 3 == 0 else (nk // 2, 2)
    return YoloConfig(family=family, scale=scale, task=task, nc=nc, kpt=kpt)


def load_checkpoint(path: str):
    """-> (params, YoloConfig, names dict). The one-call entry used by
    pipeline.Pipeline when ``weights`` is a file path."""
    if path.endswith(".npz"):
        return load_npz_checkpoint(path)
    state, meta = load_torch_checkpoint(path)
    v7_cfg = infer_v7_config(state)
    v5_cfg = infer_v5_config(state)
    if v7_cfg is not None:
        cfg = v7_cfg
        params = port_yolov7(state, cfg)
    elif v5_cfg is not None:
        cfg = v5_cfg
        params = port_yolov5(state, cfg)
    else:
        cfg = infer_config(state, meta)
        params = port_yolo(state, cfg)
    names = meta.get("names")
    if isinstance(names, dict):
        names = {int(k): str(v) for k, v in names.items()}
    return params, cfg, names


# ---------------------------------------------------------------------------
# Native .npz save/load (framework-native checkpoint format)
# ---------------------------------------------------------------------------


def save_npz_checkpoint(path: str, params: Params, cfg: YoloConfig, names=None):
    import jax

    flat = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(params)[0]
    for kp, leaf in leaves_with_path:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in kp
        )
        flat[key] = np.asarray(leaf)
    flat["__cfg__"] = np.asarray(
        [cfg.family, cfg.scale, cfg.task, str(cfg.nc),
         str(cfg.kpt[0]), str(cfg.kpt[1])], dtype=object
    )
    if names:
        flat["__names__"] = np.asarray(
            [f"{k}:{v}" for k, v in names.items()], dtype=object
        )
    np.savez(path, **flat)


def load_npz_checkpoint(path: str):
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=True)
    cfg_rec = list(data["__cfg__"])
    family, scale, task, nc = cfg_rec[:4]
    kpt = (
        (int(cfg_rec[4]), int(cfg_rec[5])) if len(cfg_rec) >= 6 else (17, 3)
    )
    cfg = YoloConfig(
        family=str(family), scale=str(scale), task=str(task), nc=int(nc),
        kpt=kpt,
    )
    names = None
    if "__names__" in data:
        names = {}
        for item in data["__names__"]:
            k, _, v = str(item).partition(":")
            names[int(k)] = v
    tree: Params = {}
    for key in data.files:
        if key.startswith("__"):
            continue
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    params = _listify(tree)
    return params, cfg, names


def _listify(node):
    """Convert {'0': .., '1': ..} dicts (from flattened list paths)
    back into lists."""
    if isinstance(node, dict):
        conv = {k: _listify(v) for k, v in node.items()}
        if conv and all(k.isdigit() for k in conv):
            return [conv[str(i)] for i in range(len(conv))]
        return conv
    return node


# ---------------------------------------------------------------------------
# YOLOv5 (classic + ultralytics 'u') porting
# ---------------------------------------------------------------------------

# sequential indices of the v5 v6.0 layout (same for classic & 'u';
# only the Detect head at 24 differs)
_V5_LAYOUT = {
    "stem": 0, "down1": 1, "stage1": 2, "down2": 3, "stage2": 4,
    "down3": 5, "stage3": 6, "down4": 7, "stage4": 8, "sppf": 9,
    "lat5": 10, "td1": 13, "lat4": 14, "td2": 17,
    "bu1_conv": 18, "bu1": 20, "bu2_conv": 21, "bu2": 23, "head": 24,
}


def port_yolov5(state_dict: dict, cfg) -> Params:
    """Map a yolov5/v5u state_dict onto models/yolov5.py's tree.

    cfg: models.yolov5.Yolov5Config. Classic checkpoints carry plain
    ``model.24.m.{i}`` anchor convs; 'u' checkpoints carry the v8
    cv2/cv3 towers.
    """
    sd = state_dict
    L = {k: f"model.{v}" for k, v in _V5_LAYOUT.items()}
    p: Params = {
        "stem": _conv(sd, L["stem"]),
        "down1": _conv(sd, L["down1"]),
        "stage1": _c3(sd, L["stage1"]),
        "down2": _conv(sd, L["down2"]),
        "stage2": _c3(sd, L["stage2"]),
        "down3": _conv(sd, L["down3"]),
        "stage3": _c3(sd, L["stage3"]),
        "down4": _conv(sd, L["down4"]),
        "stage4": _c3(sd, L["stage4"]),
        "sppf": _sppf(sd, L["sppf"]),
        "lat5": _conv(sd, L["lat5"]),
        "td1": _c3(sd, L["td1"]),
        "lat4": _conv(sd, L["lat4"]),
        "td2": _c3(sd, L["td2"]),
        "bu1_conv": _conv(sd, L["bu1_conv"]),
        "bu1": _c3(sd, L["bu1"]),
        "bu2_conv": _conv(sd, L["bu2_conv"]),
        "bu2": _c3(sd, L["bu2"]),
    }
    h = L["head"]
    if cfg.anchor_free:
        p["detect"] = {
            "box": [_branch(sd, f"{h}.cv2.{i}") for i in range(3)],
            "cls": [_branch(sd, f"{h}.cv3.{i}") for i in range(3)],
        }
    else:
        p["detect"] = {"m": [_conv2d(sd, f"{h}.m.{i}") for i in range(3)]}
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p)


def infer_v5_config(state_dict: dict):
    """Detect a yolov5/v5u checkpoint and build its config, or None."""
    from strongsort_yolo_tpu.models.yolov5 import Yolov5Config

    classic = "model.24.m.0.weight" in state_dict
    u_head = "model.24.cv2.0.0.conv.weight" in state_dict
    if not (classic or u_head):
        return None
    stem_out = state_dict["model.0.conv.weight"].shape[0]
    scale = {16: "n", 32: "s", 48: "m", 64: "l", 80: "x"}.get(stem_out, "n")
    nc = 80
    if classic:
        no = state_dict["model.24.m.0.weight"].shape[0]
        nc = no // 3 - 5
    else:
        nc = state_dict["model.24.cv3.0.2.weight"].shape[0]
    return Yolov5Config(scale=scale, nc=nc, anchor_free=u_head)


# ---------------------------------------------------------------------------
# YOLOv7 porting (official WongKinYiu/yolov7 layout)
# ---------------------------------------------------------------------------

# Sequential indices of the official yolov7.yaml (base model). ELAN
# entries are (cv1, cv2, [inner convs], merge); MP down-transitions are
# (post-pool 1x1, pre-strided 1x1, strided 3x3) — the yaml spells each
# block out as individual Conv layers + Concat, so every index below is
# one ``model.{i}`` Conv.
_V7_IDX = {
    "stem0": 0, "stem1": 1, "stem2": 2, "down2": 3,
    "elan2": (4, 5, [6, 7, 8, 9], 11),
    "mp3": (13, 14, 15),
    "elan3": (17, 18, [19, 20, 21, 22], 24),
    "mp4": (26, 27, 28),
    "elan4": (30, 31, [32, 33, 34, 35], 37),
    "mp5": (39, 40, 41),
    "elan5": (43, 44, [45, 46, 47, 48], 50),
    "sppcspc": 51,
    "lat4": 52, "route4": 54,
    "elan_h4": (56, 57, [58, 59, 60, 61], 63),
    "lat3": 64, "route3": 66,
    "elan_h3": (68, 69, [70, 71, 72, 73], 75),
    "mp_h4": (77, 78, 79),
    "elan_h4b": (81, 82, [83, 84, 85, 86], 88),
    "mp_h5": (90, 91, 92),
    "elan_h5": (94, 95, [96, 97, 98, 99], 101),
    "rep3": 102, "rep4": 103, "rep5": 104,
    "detect": 105,
}


def _v7_elan(sd, idx):
    cv1, cv2, inner, merge = idx
    return {
        "cv1": _conv(sd, f"model.{cv1}"),
        "cv2": _conv(sd, f"model.{cv2}"),
        "inner": [_conv(sd, f"model.{i}") for i in inner],
        "merge": _conv(sd, f"model.{merge}"),
    }


def _v7_mp(sd, idx):
    a, b, c = idx  # post-pool 1x1, pre-strided 1x1, strided 3x3
    return {
        "cv1": _conv(sd, f"model.{a}"),
        "cv2": _conv(sd, f"model.{b}"),
        "cv3": _conv(sd, f"model.{c}"),
    }


def _v7_repconv(sd, i):
    """RepConv: training form (rbr_dense/rbr_1x1 conv+BN pairs) or the
    deployed single conv (rbr_reparam)."""
    if f"model.{i}.rbr_reparam.weight" in sd:
        return {"fused": {
            "w": np.transpose(sd[f"model.{i}.rbr_reparam.weight"], (2, 3, 1, 0)),
            "b": sd[f"model.{i}.rbr_reparam.bias"],
        }}

    def branch(name):
        return {
            "w": np.transpose(sd[f"model.{i}.{name}.0.weight"], (2, 3, 1, 0)),
            "bn_scale": sd[f"model.{i}.{name}.1.weight"],
            "bn_bias": sd[f"model.{i}.{name}.1.bias"],
            "bn_mean": sd[f"model.{i}.{name}.1.running_mean"],
            "bn_var": sd[f"model.{i}.{name}.1.running_var"],
        }

    return {"dense": branch("rbr_dense"), "one": branch("rbr_1x1")}


def _v7_detect(sd, i):
    """IDetect head: fold the implicit-knowledge layers into the 1x1
    convs (y = im * conv(x + ia)  =>  W'=W*im, b'=(b + W·ia)*im) — the
    same algebra as the official deploy fuse()."""
    out = []
    for j in range(3):
        w = sd[f"model.{i}.m.{j}.weight"]  # (na*no, c, 1, 1)
        b = sd[f"model.{i}.m.{j}.bias"].copy()
        ia = sd.get(f"model.{i}.ia.{j}.implicit")
        im = sd.get(f"model.{i}.im.{j}.implicit")
        if ia is not None:
            b = b + w.reshape(w.shape[0], -1) @ ia.reshape(-1)
        if im is not None:
            w = w * im.reshape(-1, 1, 1, 1)
            b = b * im.reshape(-1)
        out.append({"w": np.transpose(w, (2, 3, 1, 0)), "b": b})
    return {"m": out}


def port_yolov7(state_dict: dict, cfg=None) -> Params:
    """Map an official yolov7 state_dict onto models/yolov7.py's tree."""
    sd = state_dict
    ix = _V7_IDX
    p: Params = {
        "stem0": _conv(sd, f"model.{ix['stem0']}"),
        "stem1": _conv(sd, f"model.{ix['stem1']}"),
        "stem2": _conv(sd, f"model.{ix['stem2']}"),
        "down2": _conv(sd, f"model.{ix['down2']}"),
        "elan2": _v7_elan(sd, ix["elan2"]),
        "mp3": _v7_mp(sd, ix["mp3"]),
        "elan3": _v7_elan(sd, ix["elan3"]),
        "mp4": _v7_mp(sd, ix["mp4"]),
        "elan4": _v7_elan(sd, ix["elan4"]),
        "mp5": _v7_mp(sd, ix["mp5"]),
        "elan5": _v7_elan(sd, ix["elan5"]),
        "sppcspc": {
            k: _conv(sd, f"model.{ix['sppcspc']}.{k}")
            for k in ("cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv7")
        },
        "lat4": _conv(sd, f"model.{ix['lat4']}"),
        "route4": _conv(sd, f"model.{ix['route4']}"),
        "elan_h4": _v7_elan(sd, ix["elan_h4"]),
        "lat3": _conv(sd, f"model.{ix['lat3']}"),
        "route3": _conv(sd, f"model.{ix['route3']}"),
        "elan_h3": _v7_elan(sd, ix["elan_h3"]),
        "mp_h4": _v7_mp(sd, ix["mp_h4"]),
        "elan_h4b": _v7_elan(sd, ix["elan_h4b"]),
        "mp_h5": _v7_mp(sd, ix["mp_h5"]),
        "elan_h5": _v7_elan(sd, ix["elan_h5"]),
        "rep3": _v7_repconv(sd, ix["rep3"]),
        "rep4": _v7_repconv(sd, ix["rep4"]),
        "rep5": _v7_repconv(sd, ix["rep5"]),
        "detect": _v7_detect(sd, ix["detect"]),
    }
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p)


def infer_v7_config(state_dict: dict):
    """Detect an official-yolov7 checkpoint and build its config, or
    None. Signature: RepConv keys at model.102-104 + head at 105."""
    from strongsort_yolo_tpu.models.yolov7 import V7_ANCHORS, Yolov7Config

    keys = state_dict.keys()
    rep = f"model.{_V7_IDX['rep3']}"
    if not (
        f"{rep}.rbr_dense.0.weight" in keys or f"{rep}.rbr_reparam.weight" in keys
    ):
        return None
    head = f"model.{_V7_IDX['detect']}"
    no_total = state_dict[f"{head}.m.0.weight"].shape[0]
    nc = no_total // 3 - 5
    # sanity-check the anchor priors when the buffer is present
    ag = state_dict.get(f"{head}.anchor_grid")
    if ag is not None:
        got = np.asarray(ag).reshape(3, 3, 2)
        want = np.asarray(V7_ANCHORS, np.float32)
        if not np.allclose(got, want, atol=0.5):
            print(
                "[porting] WARNING: yolov7 checkpoint anchors differ from "
                f"the base priors; decode will use the checkpoint-era table:\n{got}"
            )
    return Yolov7Config(nc=nc)


# ---------------------------------------------------------------------------
# OSNet porting (torchreid layout)
# ---------------------------------------------------------------------------

_OSNET_STAGES = {
    "b2a": "conv2.0", "b2b": "conv2.1", "t2": "conv2.2.0",
    "b3a": "conv3.0", "b3b": "conv3.1", "t3": "conv3.2.0",
    "b4a": "conv4.0", "b4b": "conv4.1",
}


def _os_lite(sd, prefix):
    """torchreid LightConv3x3: conv1 (linear 1x1), conv2 (depthwise
    3x3), one bn."""
    pw_w = np.transpose(sd[f"{prefix}.conv1.weight"], (2, 3, 1, 0))
    c_out = pw_w.shape[-1]
    return {
        "pw": {"w": pw_w, "b": np.zeros((c_out,), np.float32)},
        "dw": {
            "w": np.transpose(sd[f"{prefix}.conv2.weight"], (2, 3, 1, 0)),
            "bn_scale": sd[f"{prefix}.bn.weight"],
            "bn_bias": sd[f"{prefix}.bn.bias"],
            "bn_mean": sd[f"{prefix}.bn.running_mean"],
            "bn_var": sd[f"{prefix}.bn.running_var"],
        },
    }


def _os_block_port(sd, prefix):
    stream_lens = {"conv2a": 1, "conv2b": 2, "conv2c": 3, "conv2d": 4}
    streams = []
    for name, t in stream_lens.items():
        if t == 1:
            streams.append([_os_lite(sd, f"{prefix}.{name}")])
        else:
            streams.append(
                [_os_lite(sd, f"{prefix}.{name}.{j}") for j in range(t)]
            )
    p = {
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "gate": {
            "fc1": _conv2d(sd, f"{prefix}.gate.fc1"),
            "fc2": _conv2d(sd, f"{prefix}.gate.fc2"),
        },
        "conv3": _conv(sd, f"{prefix}.conv3"),
        "streams": streams,
    }
    if f"{prefix}.downsample.conv.weight" in sd:
        p["down"] = _conv(sd, f"{prefix}.downsample")
    return p


def port_osnet(state_dict: dict) -> Params:
    """Map a torchreid OSNet state_dict onto models/osnet.py's tree."""
    sd = state_dict
    p: Params = {"stem": _conv(sd, "conv1")}
    for ours, theirs in _OSNET_STAGES.items():
        if ours.startswith("t"):
            p[ours] = _conv(sd, theirs)
        else:
            p[ours] = _os_block_port(sd, theirs)
    p["conv5"] = _conv(sd, "conv5")
    lin_w = sd["fc.0.weight"]  # (feat, c4)
    p["fc"] = {
        "lin": {
            "w": np.transpose(lin_w)[None, None],  # (1,1,c4,feat)
            "b": sd["fc.0.bias"],
        },
        "bn": {
            "bn_scale": sd["fc.1.weight"],
            "bn_bias": sd["fc.1.bias"],
            "bn_mean": sd["fc.1.running_mean"],
            "bn_var": sd["fc.1.running_var"],
        },
    }
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p)


def infer_osnet_config(state_dict: dict):
    """-> OsnetConfig from checkpoint structure, or None."""
    from strongsort_yolo_tpu.models.osnet import OsnetConfig, VARIANTS

    if "conv2.0.conv2a.conv1.weight" not in state_dict:
        return None
    c1 = state_dict["conv1.conv.weight"].shape[0]
    variant = None
    for name, m in VARIANTS.items():
        if int(64 * m) == c1:
            variant = name
            break
    if variant is None:
        return None
    feat_dim = state_dict["fc.0.weight"].shape[0]
    return OsnetConfig(variant=variant, feat_dim=feat_dim)


def load_reid_checkpoint(path: str):
    """Load a torchreid OSNet ``.pt``/``.pth`` -> (params, OsnetConfig).

    torchreid checkpoints are either a bare state_dict or
    {"state_dict": ...}, with optional DataParallel "module." prefixes.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    state = {}
    for k, v in sd.items():
        if not hasattr(v, "detach"):
            continue
        k = k[len("module."):] if k.startswith("module.") else k
        state[k] = v.detach().float().cpu().numpy()
    cfg = infer_osnet_config(state)
    if cfg is None:
        raise ValueError(f"{path} is not a recognizable torchreid OSNet checkpoint")
    return port_osnet(state), cfg
