"""Scratch: dump compiled HLO of the batched forward; print the
instructions matching the hot trace op names (shapes + metadata)."""
import re
import numpy as np
import jax
import jax.numpy as jnp

from strongsort_yolo_tpu.models.yolo import (
    YoloConfig, init_model, fuse_model, model_apply,
)

S = 32
size = 640
cfg = YoloConfig(family="v8", scale="n", task="detect")
params = fuse_model(init_model(jax.random.PRNGKey(0), cfg))
imgs = jnp.asarray(
    np.random.default_rng(0).uniform(0, 1, (S, size, size, 3)), jnp.bfloat16
)


@jax.jit
def fwd(carry):
    out = model_apply(params, imgs + carry.astype(jnp.bfloat16), cfg,
                      compute_dtype=jnp.bfloat16)
    return jnp.float32(out["cls_logits"].sum() + out["box_logits"].sum())


txt = fwd.lower(jnp.float32(0)).compile().as_text()
open("/tmp/fwd_hlo.txt", "w").write(txt)
print(f"HLO chars: {len(txt)}")

HOT = [
    "fusion ", "multiply_add_fusion.1 ", "divide_multiply_fusion.4 ",
    "multiply_add_fusion ", "fusion.397 ", "fusion.400 ",
    "copy.15 ", "copy.18 ", "copy.6 ", "copy.8 ", "copy.5 ", "copy.17 ",
    "fusion.399 ", "fusion.401 ", "convolution_add_fusion ",
    "copy.14 ", "pad_maximum_fusion ", "copy.9 ", "fusion.398 ",
    "convolution_add_fusion.1 ", "fusion.407 ", "fusion.406 ",
    "copy.11 ", "copy.12 ", "broadcast_in_dim.15 ",
]
for line in txt.splitlines():
    ls = line.strip()
    for h in HOT:
        if ls.startswith("%" + h.strip() + " ") or ls.startswith(h.strip() + " ") or (" = " in ls and ls.split(" = ")[0].strip().lstrip("%") == h.strip()):
            print(ls[:400])
            break
