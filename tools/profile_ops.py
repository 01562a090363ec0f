"""Per-op latency profile on the real chip (readback-timed).

Times the candidate hot ops of the guided step in isolation so optimization
targets are measured, not guessed. Methodology per PERF.md: jit a scalar
readback (`.astype(f32).sum()`), pull to host each rep, subtract the fixed
readback overhead measured on a trivial function.

Usage: python tools/profile_ops.py [op ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

# honor JAX_PLATFORMS for off-TPU validation: this machine's sitecustomize
# registers the axon plugin at startup and the env var alone doesn't switch
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# serialize chip users (resident bench loop / measurement queue / driver
# bench) behind the cooperative single-chip lock; block — the queue runs
# this profiler deliberately and should wait its turn, not skip
from flair_tpu.utils.locking import acquire_tpu_lock, tpu_lock_needed

if tpu_lock_needed() and acquire_tpu_lock(timeout_s=3600.0) is None:
    sys.exit("chip lock busy for 1h; aborting profile run")

from flair_tpu.ops.deform import deform_conv2d_patch, deform_conv2d
from flair_tpu.ops.warp import flow_warp


def timeit(name, fn, *args, reps=3):
    f = jax.jit(lambda *a: fn(*a).astype(jnp.float32).sum())
    t0 = time.time()
    v = float(f(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        v = float(f(*args))
        ts.append(time.time() - t0)
    ms = min(ts) * 1e3
    print(f"{name:46s} {ms - OVERHEAD_MS:9.1f} ms   (compile {compile_s:.1f}s, raw {ms:.1f})",
          flush=True)
    return ms - OVERHEAD_MS


# fixed readback overhead
_triv = jax.jit(lambda x: x.sum())
_z = jnp.zeros((8, 128), jnp.float32)
float(_triv(_z))
_ts = []
for _ in range(5):
    _t0 = time.time()
    float(_triv(_z))
    _ts.append(time.time() - _t0)
OVERHEAD_MS = min(_ts) * 1e3
print(f"# readback overhead: {OVERHEAD_MS:.1f} ms", flush=True)

want = set(sys.argv[1:])


def sel(name):
    return not want or any(w in name for w in want)


key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 16)

if sel("dcn"):
    for (h, cin, cout) in [(512, 128, 64), (256, 256, 128)]:
        b, g, kk, M = 1, 16, 9, 5
        x = jax.random.normal(ks[0], (b, h, h, cin), jnp.bfloat16)
        flow = jax.random.normal(ks[1], (b, h, h, 2, 2), jnp.float32) * 8.0
        res = jnp.tanh(jax.random.normal(ks[2], (b, h, h, g, kk, 2), jnp.float32)) * M
        off = jnp.repeat(flow, g // 2, axis=3)[:, :, :, :, None, :] + res
        mask = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h, h, g, kk), jnp.float32))
        wgt = jax.random.normal(ks[4], (3, 3, cin, cout), jnp.bfloat16) * 0.05
        ps = 2 * M + 4
        timeit(f"dcn_patch {h}^2 cin{cin} ps{ps}",
               lambda x, off, mask, wgt, flow: deform_conv2d_patch(
                   x, flow, off, wgt, mask=mask, patch_size=ps),
               x, off, mask, wgt, flow)

if sel("warp"):
    for (h, c) in [(512, 64), (512, 128), (256, 128), (128, 256), (64, 32)]:
        x = jax.random.normal(ks[5], (1, h, h, c), jnp.bfloat16)
        fl = jax.random.normal(ks[6], (1, h, h, 2), jnp.float32) * 8.0
        timeit(f"flow_warp {h}^2 c{c}", flow_warp, x, fl)

if sel("conv"):
    for (h, c) in [(512, 64), (256, 128)]:
        x = jax.random.normal(ks[7], (1, h, h, c), jnp.bfloat16)
        w = jax.random.normal(ks[8], (3, 3, c, c), jnp.bfloat16) * 0.05
        timeit(f"conv3x3 {h}^2 c{c}",
               lambda x, w: jax.lax.conv_general_dilated(
                   x, w, (1, 1), "SAME",
                   dimension_numbers=("NHWC", "HWIO", "NHWC")), x, w)

if sel("spynet"):
    from flair_tpu.models.spynet import SPyNet
    net = SPyNet(dtype=jnp.bfloat16)
    a = jax.random.uniform(ks[9], (9, 512, 512, 3), jnp.float32)
    bb = jax.random.uniform(ks[10], (9, 512, 512, 3), jnp.float32)
    params = net.init(ks[11], a[:1], bb[:1])
    timeit("spynet 9 pairs 512^2", lambda a, b: net.apply(params, a, b), a, bb)

if sel("unet") or sel("step"):
    from flair_tpu.models.sr3 import BicubicUNet
    size, frames = 512, 10
    model = BicubicUNet(
        inner_channel=64, norm_groups=16, channel_mults=(1, 2, 4, 8, 16),
        attn_res=(64, 32), vsrpp_res=(512, 256), image_size=size,
        res_blocks=1, num_frames=7, head_dim=64, temporal_attn=True,
        cross_frame_module=True, dtype=jnp.bfloat16)
    x = jax.random.uniform(ks[12], (1, frames, size, size, 3), jnp.float32) * 2 - 1
    lvl = jnp.full((1, frames), 0.5, jnp.float32)
    shapes = jax.eval_shape(model.init, key, x, lvl, x)
    params = jax.tree_util.tree_map(
        lambda s: jax.random.normal(jax.random.PRNGKey(3), s.shape, s.dtype) * 0.02,
        shapes)
    if sel("unet"):
        timeit("BicubicUNet fwd 512^2 x10f",
               lambda p, x, l: model.apply(p, x, l, x, rnn_input=x), params, x, lvl)

if sel("ablate"):
    # component breakdown of the default tile-DCN config via kernel
    # ablation modes (post layout-fix; the round-2 ablation numbers mixed
    # the 16x-padded coordinate-prep tax into "fixed")
    from flair_tpu.ops.dcn_pallas import deform_conv2d_tile
    for (h, cin, cout, M) in [(512, 128, 64, 5), (256, 256, 128, 5)]:
        b, g, kk = 1, 16, 9
        x = jax.random.normal(ks[0], (b, h, h, cin), jnp.bfloat16)
        flow = jax.random.normal(ks[1], (b, h, h, 2, 2), jnp.float32) * 8.0
        flow = jax.image.resize(flow[:, ::8, ::8], flow.shape, "linear")
        res = jnp.tanh(jax.random.normal(ks[2], (b, h, h, g, kk, 2),
                                         jnp.float32) * 0.3) * M
        off = jnp.repeat(flow, g // 2, axis=3)[:, :, :, :, None, :] + res
        mask = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h, h, g, kk),
                                                jnp.float32))
        wgt = jax.random.normal(ks[4], (3, 3, cin, cout), jnp.bfloat16) * 0.05
        for ab in ("", "empty", "prep", "nodma", "nobuild", "onedot"):
            name = f"dcn_tile {h}^2 cin{cin} ablate={ab or 'none'}"
            try:
                timeit(name,
                       lambda x, anchor, off, wgt, mask, ab=ab:
                       deform_conv2d_tile(
                           x, anchor, off, wgt, mask=mask, tile=(2, 4),
                           patch=(16, 32), ntb=16, ablate=ab),
                       x, flow, off, wgt, mask)
            except Exception as e:  # noqa: BLE001
                print(f"{name:46s} FAILED {type(e).__name__}: {e}",
                      flush=True)

if sel("bigntb"):
    # the ablate stage showed ~37 ms of per-call overhead that is neither
    # DMA nor kernel compute — if it scales with grid steps, larger DMA
    # batches (feasible since ntb2 bounds the samp scratch) cut it
    from flair_tpu.ops.dcn_pallas import deform_conv2d_tile
    for (h, cin, cout, ntbs) in [(512, 128, 64, (16, 32, 64)),
                                 (256, 256, 128, (8, 16))]:
        b, g, kk, M = 1, 16, 9, 5
        x = jax.random.normal(ks[0], (b, h, h, cin), jnp.bfloat16)
        flow = jax.random.normal(ks[1], (b, h, h, 2, 2), jnp.float32) * 8.0
        flow = jax.image.resize(flow[:, ::8, ::8], flow.shape, "linear")
        res = jnp.tanh(jax.random.normal(ks[2], (b, h, h, g, kk, 2),
                                         jnp.float32) * 0.3) * M
        off = jnp.repeat(flow, g // 2, axis=3)[:, :, :, :, None, :] + res
        mask = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h, h, g, kk),
                                                jnp.float32))
        wgt = jax.random.normal(ks[4], (3, 3, cin, cout), jnp.bfloat16) * 0.05
        for ntb in ntbs:
            for ab in ("", "empty"):
                name = (f"dcn_tile {h}^2 cin{cin} ntb{ntb}"
                        + (f" ablate={ab}" if ab else ""))
                try:
                    timeit(name,
                           lambda x, anchor, off, wgt, mask, n=ntb, ab=ab:
                           deform_conv2d_tile(
                               x, anchor, off, wgt, mask=mask, tile=(2, 4),
                               patch=(16, 32), ntb=n, ablate=ab),
                           x, flow, off, wgt, mask)
                except Exception as e:  # noqa: BLE001
                    print(f"{name:46s} FAILED {type(e).__name__}: {e}",
                          flush=True)

if sel("tile"):
    # Pallas tile-DCN lever sweep (PERF.md "next levers"): lane_slice halves
    # dot MACs when xpack>1 (ca=64); (4,4)/(20,32) amortises per-step fixed
    # costs over 4x the pixels; ntb trades DMA batch vs scratch.
    from flair_tpu.ops.dcn_pallas import deform_conv2d_tile
    for (h, cin, cout, M) in [(512, 128, 64, 5), (512, 128, 64, 10),
                              (256, 256, 128, 5)]:
        b, g, kk = 1, 16, 9
        x = jax.random.normal(ks[0], (b, h, h, cin), jnp.bfloat16)
        flow = jax.random.normal(ks[1], (b, h, h, 2, 2), jnp.float32) * 8.0
        # smooth flows (tile anchors assume local smoothness)
        flow = jax.image.resize(flow[:, ::8, ::8], flow.shape, "linear")
        res = jnp.tanh(jax.random.normal(ks[2], (b, h, h, g, kk, 2),
                                         jnp.float32) * 0.3) * M
        off = jnp.repeat(flow, g // 2, axis=3)[:, :, :, :, None, :] + res
        mask = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h, h, g, kk),
                                                jnp.float32))
        wgt = jax.random.normal(ks[4], (3, 3, cin, cout), jnp.bfloat16) * 0.05
        anchor = flow
        pty = 16 if M <= 5 else 24
        # generate tile×ntb×lane candidates, VMEM-estimated: the kernel's
        # build_chunk/ntb2 auto-chunking bounds samp (≤4M) and build
        # temporaries (≤3M); patch scratch and double-buffered coord
        # blocks still scale with ntb — skip configs those alone blow.
        ca = cin // 2
        xpack = 128 // ca
        cfgs = []
        for tile in [(2, 4), (4, 4), (4, 8), (8, 8)]:
            p = (pty + (tile[0] if tile[0] > 2 else 0), 32)
            for ntb in [8, 16, 32]:
                for lane in ([False, True] if xpack > 1 else [False]):
                    tpix = tile[0] * tile[1]
                    rr = 9 * tpix * 8
                    patch_mb = (2 * ntb * 2 * p[0] * (32 // xpack) * 128
                                * 2) / 2**20
                    blocks_mb = 2 * 3 * ntb * 2 * rr * 4 / 2**20
                    if patch_mb + blocks_mb + 4 + 3 > 14.5:
                        continue
                    n_tiles = (h // tile[0]) * (h // tile[1])
                    if n_tiles % ntb:
                        continue
                    cfgs.append((tile, p, ntb, lane))
        for tile, patch, ntb, lane in cfgs:
            name = (f"dcn_tile {h}^2 cin{cin} M{M} t{tile[0]}x{tile[1]} "
                    f"p{patch[0]}x{patch[1]} ntb{ntb}"
                    + (" lane" if lane else ""))
            try:
                timeit(name,
                       lambda x, anchor, off, wgt, mask, t=tile, p=patch,
                              n=ntb, l=lane: deform_conv2d_tile(
                           x, anchor, off, wgt, mask=mask, tile=t, patch=p,
                           ntb=n, lane_slice=l),
                       x, anchor, off, wgt, mask)
            except Exception as e:  # noqa: BLE001
                print(f"{name:46s} FAILED {type(e).__name__}: {e}",
                      flush=True)

if sel("b2grid"):
    # VERDICT r4 #8: before retiring batching, re-test it at the KERNEL
    # GRID level — b=2 doubles n_tiles through ONE pallas launch (grid
    # spans both windows' tiles), sharing whatever per-launch/per-grid
    # fixed costs exist. Keep if b=2 ≤ 1.3× the b=1 call; else the r4
    # "amortization dead" verdict stands at kernel granularity too.
    from flair_tpu.ops.dcn_pallas import deform_conv2d_tile

    for (h, cin, cout, M) in [(512, 128, 64, 5), (256, 256, 128, 5)]:
        g, kk = 16, 9
        pty = 16 if M <= 5 else 24
        for b in (1, 2):
            x = jax.random.normal(ks[0], (b, h, h, cin), jnp.bfloat16)
            fl = jax.random.normal(ks[1], (b, h, h, 2), jnp.float32) * 8.0
            fl = jax.image.resize(fl[:, ::8, ::8], fl.shape, "linear")
            flow_y = jnp.stack([fl[..., 1], -fl[..., 1]], -1)
            flow_x = jnp.stack([fl[..., 0], -fl[..., 0]], -1)
            res_y = jax.random.normal(ks[2], (b, h, h, g * kk), jnp.bfloat16)
            res_x = jax.random.normal(ks[3], (b, h, h, g * kk), jnp.bfloat16)
            mlg = jax.random.normal(ks[4], (b, h, h, g * kk), jnp.bfloat16)
            wgt = jax.random.normal(ks[5], (3, 3, cin, cout),
                                    jnp.bfloat16) * 0.05
            ntb = 8 if cin == 256 else 16
            name = f"raw b{b} {h}^2 cin{cin} M{M} (2,4)/ntb{ntb}"
            try:
                timeit(name,
                       lambda fy, fx, ry, rx, ml:
                       deform_conv2d_tile(
                           x, (fy, fx), None, wgt, None,
                           raw=(ry, rx, ml, fy, fx), raw_mrm=float(M),
                           tile=(2, 4), patch=(pty, 32), ntb=ntb),
                       flow_y, flow_x, res_y, res_x, mlg)
            except Exception as e:  # noqa: BLE001
                print(f"{name:58s} FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)

if sel("int8sweep"):
    # round-5 keep-or-kill: the int8 window-dot path (FLAIR_DCN_INT8)
    # against the shipped bf16 dots, at the default tile configs for all
    # four production shape classes. probe_int8.py measured the bare dot
    # at 2.27x (UVP=256) / 1.75x (UVP=384, 1.17x with in-kernel
    # quantize); this measures the real kernel, where dot1 is one of
    # several cost terms.
    from flair_tpu.ops.dcn_pallas import deform_conv2d_tile

    for (h, cin, cout, M) in [(512, 128, 64, 5), (512, 128, 64, 10),
                              (256, 256, 128, 5), (256, 256, 128, 10)]:
        b, g, kk = 1, 16, 9
        x = jax.random.normal(ks[0], (b, h, h, cin), jnp.bfloat16)
        fl = jax.random.normal(ks[1], (b, h, h, 2), jnp.float32) * 8.0
        fl = jax.image.resize(fl[:, ::8, ::8], fl.shape, "linear")
        flow_y = jnp.stack([fl[..., 1], -fl[..., 1]], -1)
        flow_x = jnp.stack([fl[..., 0], -fl[..., 0]], -1)
        res_y = jax.random.normal(ks[2], (b, h, h, g * kk), jnp.bfloat16)
        res_x = jax.random.normal(ks[3], (b, h, h, g * kk), jnp.bfloat16)
        mlg = jax.random.normal(ks[4], (b, h, h, g * kk), jnp.bfloat16)
        wgt = jax.random.normal(ks[5], (3, 3, cin, cout),
                                jnp.bfloat16) * 0.05
        pty = 16 if M <= 5 else 24
        ntb = 8 if (cin == 256 or pty > 16) else 16
        for int8 in (False, True):
            name = (f"raw {h}^2 cin{cin} M{M} ntb{ntb}"
                    + (" int8" if int8 else " bf16"))
            try:
                timeit(name,
                       lambda fy, fx, ry, rx, ml, i8=int8:
                       deform_conv2d_tile(
                           x, (fy, fx), None, wgt, None,
                           raw=(ry, rx, ml, fy, fx), raw_mrm=float(M),
                           tile=(2, 4), patch=(pty, 32), ntb=ntb,
                           int8_dots=i8),
                       flow_y, flow_x, res_y, res_x, mlg)
            except Exception as e:  # noqa: BLE001
                print(f"{name:58s} FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)

if sel("rawablate"):
    # component split of the SHIPPED raw-path call at the default configs
    # (the round-3 `ablate` numbers predate the raw-prep rewrite): where
    # do the 46/60 ms go now — XLA prep, grid/dispatch, DMA, window
    # build, or the parity dots?
    from flair_tpu.ops.dcn_pallas import deform_conv2d_tile

    for (h, cin, cout, M) in [(512, 128, 64, 5), (512, 128, 64, 10),
                              (256, 256, 128, 5)]:
        b, g, kk = 1, 16, 9
        x = jax.random.normal(ks[0], (b, h, h, cin), jnp.bfloat16)
        fl = jax.random.normal(ks[1], (b, h, h, 2), jnp.float32) * 8.0
        fl = jax.image.resize(fl[:, ::8, ::8], fl.shape, "linear")
        flow_y = jnp.stack([fl[..., 1], -fl[..., 1]], -1)
        flow_x = jnp.stack([fl[..., 0], -fl[..., 0]], -1)
        res_y = jax.random.normal(ks[2], (b, h, h, g * kk), jnp.bfloat16)
        res_x = jax.random.normal(ks[3], (b, h, h, g * kk), jnp.bfloat16)
        mlg = jax.random.normal(ks[4], (b, h, h, g * kk), jnp.bfloat16)
        wgt = jax.random.normal(ks[5], (3, 3, cin, cout),
                                jnp.bfloat16) * 0.05
        pty = 16 if M <= 5 else 24
        ntb = 8 if (cin == 256 or pty > 16) else 16
        for ab in ("", "prep", "empty", "nodma", "nobuild", "onedot"):
            name = (f"raw {h}^2 cin{cin} M{M} ntb{ntb} "
                    f"ablate={ab or 'none'}")
            try:
                timeit(name,
                       lambda fy, fx, ry, rx, ml, ab=ab:
                       deform_conv2d_tile(
                           x, (fy, fx), None, wgt, None,
                           raw=(ry, rx, ml, fy, fx), raw_mrm=float(M),
                           tile=(2, 4), patch=(pty, 32), ntb=ntb,
                           ablate=ab),
                       flow_y, flow_x, res_y, res_x, mlg)
            except Exception as e:  # noqa: BLE001
                print(f"{name:58s} FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)

if sel("rawsweep"):
    # raw-prep serving-path sweep (post lever-#2/#3: the kernel consumes
    # PRE-ACTIVATION logits + flow planes — the cost structure the old
    # `tile` sweep's materialized offsets no longer represent). Focus:
    # the ADM/BlurUNet M=10 shapes, where pty=24 forces ntb=8 under the
    # 16 M scoped-VMEM limit (r3 probe) and per-call cost is 43.6 ms
    # in-step vs bicubic's 31.4 (round-4 blur trace).
    from flair_tpu.ops.dcn_pallas import deform_conv2d_tile

    for (h, cin, cout, M) in [(512, 128, 64, 10), (256, 256, 128, 10),
                              (512, 128, 64, 5)]:
        b, g, kk = 1, 16, 9
        x = jax.random.normal(ks[0], (b, h, h, cin), jnp.bfloat16)
        fl = jax.random.normal(ks[1], (b, h, h, 2), jnp.float32) * 8.0
        fl = jax.image.resize(fl[:, ::8, ::8], fl.shape, "linear")
        flow_y = jnp.stack([fl[..., 1], -fl[..., 1]], -1)  # (B,H,W,A)
        flow_x = jnp.stack([fl[..., 0], -fl[..., 0]], -1)
        res_y = jax.random.normal(ks[2], (b, h, h, g * kk), jnp.bfloat16)
        res_x = jax.random.normal(ks[3], (b, h, h, g * kk), jnp.bfloat16)
        mlg = jax.random.normal(ks[4], (b, h, h, g * kk), jnp.bfloat16)
        wgt = jax.random.normal(ks[5], (3, 3, cin, cout),
                                jnp.bfloat16) * 0.05
        pty = 16 if M <= 5 else 24
        xpack = 128 // (cin // 2)
        # lane variants (VERDICT r4 #1): the r3 "lane loses to MXU
        # min-width" verdict predates the raw-prep rewrite — re-probe
        # lane on/off at both M classes under the raw operand layouts
        cfgs = [((2, 4), (pty, 32), 8, False), ((2, 4), (pty, 32), 8, True),
                ((2, 4), (pty, 32), 16, False),
                ((2, 4), (pty, 32), 16, True),
                ((2, 4), (pty, 32), 4, False),
                ((4, 4), (pty + 4, 32), 8, False),
                ((4, 4), (pty + 4, 32), 8, True),
                ((4, 4), (pty + 4, 32), 4, False),
                ((4, 8), (pty + 4, 32), 4, False),
                ((2, 8), (pty, 32), 8, False), ((2, 8), (pty, 32), 8, True)]
        for tile, patch, ntb, lane in cfgs:
            if lane and xpack == 1:
                continue  # lane_slice only exists for packed (ca=64) sites
            n_tiles = (h // tile[0]) * (h // tile[1])
            if n_tiles % ntb or patch[1] % (16 * xpack):
                continue
            name = (f"raw {h}^2 cin{cin} M{M} t{tile[0]}x{tile[1]} "
                    f"p{patch[0]}x{patch[1]} ntb{ntb}"
                    + (" lane" if lane else ""))
            try:
                timeit(name,
                       lambda fy, fx, ry, rx, ml, t=tile, p=patch, n=ntb,
                              l=lane:
                       deform_conv2d_tile(
                           x, (fy, fx), None, wgt, None,
                           raw=(ry, rx, ml, fy, fx), raw_mrm=float(M),
                           tile=t, patch=p, ntb=n, lane_slice=l),
                       flow_y, flow_x, res_y, res_x, mlg)
            except Exception as e:  # noqa: BLE001
                print(f"{name:58s} FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
