"""Raw-logit serving tail, stage-0 feasibility: how much of trunk+decode is
the full-matrix cls SIGMOID?

Today's decode (yolov5.decode_level_split) applies sigmoid to the whole
(B, N, nc) class matrix (268M transcendentals at B=128) although the NMS
tail only ever reads G=384 rows per image. sigmoid is strictly monotone, so
every ranking/selection can run on raw logits + a per-ROW max (box_score =
sigmoid(obj) * sigmoid(max_c logit_c), bit-equal to max_c(conf_c) because
rounding is monotone — the same identity conf_fused relies on), and the
gathered rows get sigmoided after the gather (384*nc per image, ~nothing).
Detections stay bit-identical: same input logits, same op, just applied to
fewer elements.

Stages (chained acc, one float() fetch per region):
  A  production predict() stage-0: trunk + split decode (sigmoid over the
     full cls matrix + obj + full xywh decode)
  B  raw variant: trunk + raw split heads; emits (box_score (B,N) bf16,
     h_xy/h_wh raw, h_obj raw, h_cls raw) — per-row max over raw logits,
     sigmoid only on the (B, N) vectors
  C  B + prefilter topk + row gathers from the RAW arrays + per-row decode
     (sigmoid + conf multiply + xywh decode on G rows only) — the
     candidate-ready point of the raw tail, comparable to ablate3 stage 2+

    python tools/exp_rawtail.py [B] [iters] [dtype] [stages...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import STRIDES, YoloV5, calibrate_bn
from edgeml_tpu.ops.nms import PAIR_G, _pack17, _unpack17, topk1d
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DT = {"f32": None, "bf16": jnp.bfloat16}[
    sys.argv[3] if len(sys.argv) > 3 else "bf16"
]
CONF = 1e-5
G = PAIR_G

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
NA, NO, NC = net.na, net.no, net.num_classes


def raw_heads(imgs):
    """Trunk + split head convs, NO decode: returns per-level raw
    (h_xy, h_wh, h_obj, h_cls) in the serving dtype (h_xy/h_wh too — the
    f32 cast happens per gathered row in the raw tail)."""
    hdtype = jnp.float32 if DT is None else DT
    if DT is not None:
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(DT)
            if getattr(a, "dtype", None) == jnp.float32 else a, t)
        params_t = dict(cast(params), detect=params["detect"])
        feats, _, _ = net._trunk(params_t, cast(stats), imgs.astype(DT), False)
    else:
        feats, _, _ = net._trunk(params, stats, imgs, False)
    from edgeml_tpu.models.yolov5 import conv2d

    levels = []
    for f, p in zip(feats, params["detect"]):
        w = p["w"].reshape(1, 1, -1, NA, NO).astype(hdtype)
        bias = p["b"].reshape(NA, NO).astype(hdtype)
        h_obj = conv2d(f, w[..., 4], 1) + bias[:, 4]
        h_xy = conv2d(f, w[..., 0:2].reshape(1, 1, -1, NA * 2), 1) \
            + bias[:, 0:2].reshape(-1)
        h_wh = conv2d(f, w[..., 2:4].reshape(1, 1, -1, NA * 2), 1) \
            + bias[:, 2:4].reshape(-1)
        h_cls = conv2d(f, w[..., 5:].reshape(1, 1, -1, NA * NC), 1) \
            + bias[:, 5:].reshape(-1)
        b_, hh, ww = h_obj.shape[:3]
        levels.append((
            h_xy.reshape(b_, -1, 2 * NA).reshape(b_, hh * ww, NA, 2)
                .reshape(b_, -1, 2),
            h_wh.reshape(b_, hh * ww, NA, 2).reshape(b_, -1, 2),
            h_obj.reshape(b_, -1),
            h_cls.reshape(b_, hh * ww, NA, NC).reshape(b_, -1, NC),
        ))
    return levels


def flatten_levels(levels):
    xy = jnp.concatenate([l[0] for l in levels], 1)
    wh = jnp.concatenate([l[1] for l in levels], 1)
    obj = jnp.concatenate([l[2] for l in levels], 1)
    cls = jnp.concatenate([l[3] for l in levels], 1)
    return xy, wh, obj, cls


def row_geometry():
    """Per-row (grid_x, grid_y, stride, anchor_w, anchor_h) constants for
    the concatenated N axis (decode deferred to gathered rows)."""
    gx_l, gy_l, st_l, aw_l, ah_l = [], [], [], [], []
    s = net.img_size
    for stride, anchors in zip(STRIDES, net.anchors):
        hh = ww = s // stride
        gy, gx = jnp.meshgrid(
            jnp.arange(hh, dtype=jnp.float32),
            jnp.arange(ww, dtype=jnp.float32),
            indexing="ij",
        )
        anc = jnp.asarray(anchors, jnp.float32)  # (na, 2)
        gx_l.append(jnp.broadcast_to(gx[..., None], (hh, ww, NA)).reshape(-1))
        gy_l.append(jnp.broadcast_to(gy[..., None], (hh, ww, NA)).reshape(-1))
        st_l.append(jnp.full((hh * ww * NA,), float(stride)))
        aw_l.append(jnp.broadcast_to(anc[None, None, :, 0],
                                     (hh, ww, NA)).reshape(-1))
        ah_l.append(jnp.broadcast_to(anc[None, None, :, 1],
                                     (hh, ww, NA)).reshape(-1))
    return tuple(jnp.concatenate(v) for v in (gx_l, gy_l, st_l, aw_l, ah_l))


GEO = row_geometry()


def stage(which):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        if which == "A":
            obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)
            return acc + obj.astype(jnp.float32).sum() * 1e-9 \
                + xywh.sum() * 1e-12 + cls.astype(jnp.float32).sum() * 1e-9
        levels = raw_heads(imgs)
        xy, wh, obj_r, cls_r = flatten_levels(levels)
        # box_score: bit-equal to max_c(sigmoid(cls)*sigmoid(obj)) — rounding
        # is monotone so the max can run on raw logits.
        mx = jnp.max(cls_r, axis=-1)
        score = jax.nn.sigmoid(mx) * jax.nn.sigmoid(obj_r)
        if which == "B":
            return acc + score.astype(jnp.float32).sum() * 1e-9 \
                + xy.astype(jnp.float32).sum() * 1e-12 \
                + wh.astype(jnp.float32).sum() * 1e-12 \
                + cls_r.astype(jnp.float32).sum() * 1e-9

        # C: prefilter + raw-row gathers + per-row decode
        def one(sc, xy1, wh1, ob1, cl1):
            masked = jnp.where(sc > CONF, sc, -1.0)
            if DT == jnp.bfloat16:
                bk, pre = topk1d(_pack17(masked.astype(jnp.bfloat16)), G,
                                 chunk=masked.shape[0])
                best = _unpack17(bk, pre)
            else:
                best, pre = topk1d(masked, G, chunk=masked.shape[0])
            xyg = xy1[pre].astype(jnp.float32)
            whg = wh1[pre].astype(jnp.float32)
            obg = ob1[pre]
            clg = cl1[pre]
            gx, gy, st, aw, ah = (g[pre] for g in GEO)
            sxy = jax.nn.sigmoid(xyg)
            px = (sxy[:, 0] * 2.0 - 0.5 + gx) * st
            py = (sxy[:, 1] * 2.0 - 0.5 + gy) * st
            swh = jax.nn.sigmoid(whg)
            pw = (swh[:, 0] * 2.0) ** 2 * aw
            ph = (swh[:, 1] * 2.0) ** 2 * ah
            conf_rows = jax.nn.sigmoid(clg) * jax.nn.sigmoid(obg)[:, None]
            return (best.astype(jnp.float32).sum() * 1e-9
                    + (px + py + pw + ph).sum() * 1e-12
                    + conf_rows.astype(jnp.float32).sum() * 1e-9)

        return acc + jnp.sum(jax.vmap(one)(score, xy, wh, obj_r, cls_r))

    return fn


for which in (sys.argv[4:] or ["A", "B", "C"]):
    step = jax.jit(stage(which))
    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    print(f"stage {which}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"stage {which}: {ms:8.2f} ms/batch  {B / ms * 1e3:7.1f} img/s",
          flush=True)
