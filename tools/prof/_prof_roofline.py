"""Full-step roofline audit (VERDICT r3 ask #3).

For the S-stream batched track step, gives EVERY traced HLO op its own
bound and totals what fraction of device step time runs within 1.2x of
that bound — turning "the ~30% MFU is the roofline, not a bug" from an
assertion into a measurement.

Method:
  1. compile the step, parse the HLO text: per ENTRY instruction,
     collect (a) HBM bytes = output + operand buffer sizes (fusions
     read inputs once / write outputs once, so this is the traffic
     model XLA itself uses), (b) MXU FLOPs = sum over convolution/dot
     instructions inside the instruction's fused computation, each
     with a lane-efficiency factor eff = min(c_out, 128)/128 (a
     narrow-c_out conv cannot fill the 128 MXU lanes — the measured
     ~25% ceiling of the c_out=32 stages, NOTES round-3 conv
     shootout; reductions are all >=128 deep here so sublane padding
     is second-order).
  2. trace 5 step dispatches with jax.profiler, aggregate device time
     per ENTRY op.
  3. per op: bound_us = max(flops / (PEAK_BF16 * eff), bytes / HBM_BW)
     (pure-elementwise ops get the bytes bound; VPU-throughput limits
     are folded into "within 1.2x" slack — the step has no
     transcendental-heavy op big enough to matter, checked in the
     table).
  4. report: top ops with actual vs bound, and the audit line:
     %% of step time within 1.2x of bound, plus the step-level
     speed-of-light time = sum of per-op bounds (what a perfect
     scheduler with today's fusion boundaries would run).

v5e peaks: 197 TF/s bf16 MXU, 819 GB/s HBM.

Usage: python tools/prof/_prof_roofline.py [S] [tracker]
         tracker in {bytetrack, strongsort}
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

import bench as B  # noqa: E402
from strongsort_yolo_tpu.config import DetectorConfig  # noqa: E402
from strongsort_yolo_tpu.pipeline import Pipeline  # noqa: E402
from strongsort_yolo_tpu.track.bytetrack import ByteTrackConfig  # noqa: E402

PEAK_BF16 = 197e12
HBM_BW = 819e9

S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TRACKER = sys.argv[2] if len(sys.argv) > 2 else "bytetrack"

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(s: str) -> int:
    """Total buffer bytes of a shape string (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(s):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def shape_dims(s: str):
    m = _SHAPE_RE.search(s)
    if not m:
        return None, []
    dt, dims = m.groups()
    return dt, [int(d) for d in dims.split(",") if d]


INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^=]*?\)|\S+))\s+(\w+)\((.*)$"
)


def parse_hlo(txt: str):
    """-> (entry_ops, comp_flops) where entry_ops[name] =
    dict(shape, opcode, bytes, flops, eff_flop_us)."""
    # ---- split into computations
    comps = {}  # comp name -> list of (name, shape, opcode, rest)
    cur = None
    for line in txt.splitlines():
        stripped = line.strip()
        # computation header: ends with "{" and is not an instruction
        # assignment (" = "). NB result tuples contain `/*index=N*/`
        # comments, so a bare "=" test misclassifies ENTRY headers.
        if stripped.endswith("{") and (" = " not in stripped.split("{")[0]):
            # computation header: `%comp (...) -> ... {` or `ENTRY %main ...`
            m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)", stripped)
            cur = m.group(1) if m else None
            comps[cur] = []
            if stripped.startswith("ENTRY"):
                comps["__entry__"] = comps[cur]
            continue
        if stripped == "}":
            cur = None
            continue
        if cur is None:
            continue
        m = INSTR_RE.match(line)
        if m:
            comps[cur].append(m.groups())

    # per-computation name -> shape
    shapes = {}
    for cname, instrs in comps.items():
        d = {}
        for name, shape, opcode, rest in instrs:
            d[name] = shape
        shapes[cname] = d

    # ---- MXU flops per computation (convolution / dot bodies)
    def conv_flops(shape, rest, local_shapes):
        """2 * out_elems * reduction, eff = min(c_out,128)/128.

        Reduction = c_in * effective taps per spatial axis. XLA emits
        batch-matmuls as lhs-DILATED convolutions (window=64x256
        lhs_dilate=64x256 — each output position overlaps ONE real
        input element per axis), so taps = min(ceil(size/lhs_dilate),
        rhs_spatial) — counting the raw window size would overcount
        those by ~1000x."""
        _, out = shape_dims(shape)
        if not out:
            return 0.0, 1.0
        # rhs operand = second %name in the operand list
        ops_str = rest.split("), ")[0] if "), " in rest else rest
        names = re.findall(r"%([\w.\-]+)", ops_str)
        red = 0
        mlab = re.search(r"dim_labels=\w+_(\w+)->", rest)
        if len(names) >= 2 and names[1] in local_shapes and mlab:
            _, rdims = shape_dims(local_shapes[names[1]])
            lab = mlab.group(1)
            if rdims and len(lab) == len(rdims):
                msize = re.search(r"window=\{[^}]*size=([\dx]+)", rest)
                mdil = re.search(r"lhs_dilate=([\dx]+)", rest)
                sizes = ([int(v) for v in msize.group(1).split("x")]
                         if msize else [])
                dils = ([int(v) for v in mdil.group(1).split("x")]
                        if mdil else [1] * len(sizes))
                i_dim = 1
                spatial_rhs = {}
                for ch, d in zip(lab, rdims):
                    if ch == "i":
                        i_dim = d
                    elif ch.isdigit():
                        spatial_rhs[int(ch)] = d
                red = i_dim
                for ax in sorted(spatial_rhs):
                    taps = spatial_rhs[ax]
                    if ax < len(sizes):
                        dil = dils[ax] if ax < len(dils) else 1
                        taps = min(taps, -(-sizes[ax] // dil))
                    red *= taps
        if not red:
            # fallback: infer c_in*k*k unavailable -> treat as 128
            red = 128
        mlab2 = re.search(r"dim_labels=\w+_\w+->(\w+)", rest)
        c_out = out[-1]
        if mlab2:
            oi = mlab2.group(1).find("f")
            if 0 <= oi < len(out):
                c_out = out[oi]
        n_out = 1
        for d in out:
            n_out *= d
        eff = min(c_out, 128) / 128.0
        return 2.0 * n_out * red, eff

    def dot_flops(shape, rest, local_shapes):
        _, out = shape_dims(shape)
        if not out:
            return 0.0, 1.0
        ops_str = rest.split("), ")[0] if "), " in rest else rest
        names = re.findall(r"%([\w.\-]+)", ops_str)
        red = 128
        m = re.search(r"lhs_contracting_dims=\{([\d,]+)\}", rest)
        if m and names and names[0] in local_shapes:
            _, ldims = shape_dims(local_shapes[names[0]])
            red = 1
            for i in (int(x) for x in m.group(1).split(",")):
                if i < len(ldims):
                    red *= ldims[i]
        n_out = 1
        for d in out:
            n_out *= d
        eff = min(out[-1] if out else 128, 128) / 128.0
        return 2.0 * n_out * red, eff

    comp_mxu = {}  # comp -> (flops, flop_time_s at eff-adjusted peak)
    for cname, instrs in comps.items():
        fl, t = 0.0, 0.0
        for name, shape, opcode, rest in instrs:
            if opcode == "convolution":
                f, eff = conv_flops(shape, rest, shapes[cname])
            elif opcode == "dot":
                f, eff = dot_flops(shape, rest, shapes[cname])
            else:
                continue
            fl += f
            t += f / (PEAK_BF16 * max(eff, 1e-3))
        comp_mxu[cname] = (fl, t)

    # ---- all instructions: bytes + flops (fusions inline their
    # called computation's MXU flops). HLO names are module-unique, so
    # one flat map serves ENTRY ops AND while-body ops (the NMS greedy
    # fixpoint executes as individual trace events inside its while).
    entry = {}
    src_pat = re.compile(r'source_file="([^"]+)"[^}]*?source_line=(\d+)')
    einstrs = [
        (cname, i)
        for cname, instrs in comps.items()
        if cname != "__entry__"
        for i in instrs
    ]
    for cname, (name, shape, opcode, rest) in einstrs:
        eshapes = shapes[cname]
        ops_str = rest.split("), ")[0] if "), " in rest else rest
        names = re.findall(r"%([\w.\-]+)", ops_str)
        b = shape_bytes(shape)
        for on in names:
            if on in eshapes:
                b += shape_bytes(eshapes[on])
        fl, ft = 0.0, 0.0
        if opcode == "fusion":
            m = re.search(r"calls=%?([\w.\-]+)", rest)
            if m and m.group(1) in comp_mxu:
                fl, ft = comp_mxu[m.group(1)]
        elif opcode == "convolution":
            fl, eff = conv_flops(shape, rest, eshapes)
            ft = fl / (PEAK_BF16 * max(eff, 1e-3))
        elif opcode == "dot":
            fl, eff = dot_flops(shape, rest, eshapes)
            ft = fl / (PEAK_BF16 * max(eff, 1e-3))
        msrc = src_pat.search(rest)
        src = (
            f"{os.path.basename(msrc.group(1))}:{msrc.group(2)}"
            if msrc else "?"
        )
        entry[name] = dict(
            shape=shape, opcode=opcode, bytes=b, flops=fl, flop_s=ft, src=src
        )
    return entry


def main():
    h, w = 1080, 1920
    pool = B.make_frames(h, w)
    if TRACKER == "strongsort":
        pipe = Pipeline(
            DetectorConfig(weights="yolov8n", half=True, max_det=1000),
            tracker="strongsort.yaml", track_slots=256,
        )
    else:
        pipe = Pipeline(
            DetectorConfig(weights="yolov8n", half=True, max_det=1000),
            tracker=ByteTrackConfig(tracker_type="botsort", gmc_method="none"),
            track_slots=256,
        )
    B.calibrate_candidates(pipe, pool[0], 0.3, B.TARGET_DETS)
    bp = pipe.track_batch_prepare(S, (h, w))
    frames = jnp.asarray(np.stack([pool[i % 8] for i in range(S)]))
    warps = jnp.tile(
        jnp.asarray(np.eye(2, 3, dtype=np.float32))[None], (S, 1, 1)
    )
    step = bp._steps.batch_step

    cache = f"/tmp/roofline_hlo_{S}_{TRACKER}.txt"
    if os.environ.get("ROOFLINE_PARSE_ONLY") and os.path.exists(cache):
        txt = open(cache).read()
    else:
        txt = (
            step.lower(pipe.params, bp.states, frames, warps)
            .compile().as_text()
        )
        open(cache, "w").write(txt)
    entry = parse_hlo(txt)
    print(f"parsed {len(entry)} ENTRY ops; "
          f"{sum(1 for v in entry.values() if v['flops'])} with MXU flops",
          flush=True)

    states = bp.states
    for _ in range(3):
        states, d, o, e = step(pipe.params, states, frames, warps)
    jax.block_until_ready(states)

    outdir = "/tmp/jaxroofline"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        for _ in range(5):
            states, d, o, e = step(pipe.params, states, frames, warps)
        jax.block_until_ready(states)

    files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    procnames = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            procnames[ev.get("pid")] = ev["args"].get("name", "")

    t_op = defaultdict(float)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if "TPU" not in procnames.get(ev.get("pid"), ""):
            continue
        if ev["name"].startswith("jit_"):
            continue
        t_op[ev["name"]] += ev.get("dur", 0)

    rows = []
    total = sum(t_op.values()) / 5.0
    within = 0.0
    sol = 0.0  # speed-of-light total
    unmatched = 0.0
    for name, us5 in t_op.items():
        us = us5 / 5.0
        info = entry.get(name)
        if info is None:
            unmatched += us
            within += us  # unmatched (infeed/sync/etc): don't penalize
            continue
        hbm_us = info["bytes"] / HBM_BW * 1e6
        mxu_us = info["flop_s"] * 1e6
        bound = max(hbm_us, mxu_us)
        sol += bound
        cls = "MXU" if mxu_us >= hbm_us else "HBM"
        ratio = us / bound if bound > 0 else float("inf")
        if bound > 0 and us <= 1.2 * bound:
            within += us
        rows.append((us, bound, ratio, cls, name, info["src"],
                     info["shape"][:48]))

    rows.sort(key=lambda r: -r[0])
    print(f"\n== roofline audit: S={S} {TRACKER}, step {total:.0f} us ==")
    print(f"{'us/iter':>8} {'bound':>8} {'x':>5}  cls  op / src / shape")
    for us, bound, ratio, cls, name, src, shape in rows[:30]:
        print(f"{us:8.1f} {bound:8.1f} {ratio:5.2f}  {cls}  "
              f"{name[:34]:36s} {src:26s} {shape}")

    over = [(us, bound, ratio) for us, bound, ratio, *_ in rows
            if bound > 0 and us > 1.2 * bound]
    over_us = sum(u for u, b, r in over)
    print(f"\nstep time within 1.2x of own bound: "
          f"{within / total * 100:.1f}%  ({within:.0f}/{total:.0f} us; "
          f"unmatched/sync {unmatched:.0f} us counted as within)")
    print(f"speed-of-light step (sum of op bounds, today's fusions): "
          f"{sol:.0f} us -> max {S * 1e6 / sol:.0f} fps/chip vs measured "
          f"{S * 1e6 / total:.0f} fps/chip device-side")
    print(f"time above 1.2x bound: {over_us:.0f} us in {len(over)} ops")


if __name__ == "__main__":
    main()
