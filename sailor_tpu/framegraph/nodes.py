"""Standard frame-graph nodes — TPU-native Runtime/FrameGraph/*Node.cpp.

Data flows through the ``targets`` dict: raster products ("Depth", "TriId",
"TriSetup"), screen buffers ("Main", "AO", "LinearDepth", "Sky"), light
culling products ("LightIndices"), shadow products ("ShadowMaps",
"LightMatrices", "EvsmMap"), and temporal state via "state_out"
(avg luminance, env-map bakes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sailor_tpu import config as cfg
from sailor_tpu.core import math3d as m3
from sailor_tpu.framegraph.graph import BaseNode, node
from sailor_tpu.kernels import (
    bloom as bloom_k,
    blur as blur_k,
    cubemap as cm,
    histogram as hist_k,
    ibl as ibl_k,
    light_culling,
    pbr,
    postprocess as pp,
    sampling,
    shadow as shadow_k,
    sky as sky_k,
    tonemap as tm,
)
from sailor_tpu.raster import interpolate, setup as rsetup, tile_raster
from sailor_tpu.kernels.common import round_up


@node("Clear")
class ClearNode(BaseNode):
    """Clear a render target (ClearNode.cpp)."""

    def process(self, ctx, targets):
        name = self.p("target", "Main")
        value = self.p("clearValue", 0.0)
        if name in targets:
            targets[name] = jnp.full_like(targets[name], value)
        return targets


def _raster_merge(tri, passes, tiles_y, tiles_x, z_bounds=None,
                  screen_aabb=None):
    """Rasterize all bin passes and keep the nearest (max reverse-Z) winner."""
    depth = tid = None
    for bins, counts in passes:
        d_r, t_r = tile_raster.rasterize_tiles(
            tri, bins, tiles_y=tiles_y, tiles_x=tiles_x, counts=counts,
            z_bounds=z_bounds, screen_aabb=screen_aabb,
        )
        if depth is None:
            depth, tid = d_r, t_r
        else:
            take = d_r > depth
            depth = jnp.where(take, d_r, depth)
            tid = jnp.where(take, t_r, tid)
    return depth, tid


def _make_raster(tri, valid, aabb, tiles_y, tiles_x, config, *,
                 capacity, rounds=1, attrs=None):
    """Build ``raster(z_bounds) -> (depth, tid)`` for the configured
    backend, plus an overflow scalar (candidates beyond the per-tile
    budget of ``capacity * rounds``).

    ``attrs``: packed per-raster-triangle attribute table — stream mode
    then gathers ONE combined (raster cols + attrs) row table shared by
    the raster kernel and the fused visibility resolve, and the returned
    closure grows a ``.stream_bins`` dict for resolve_gbuffer_stream.

    ``raster_mode``:
      - "stream" (default): bin_sorted ragged segments consumed by the
        grid-(ty, tx, k) streaming kernel — no slot tables, one pass
        (tile_raster.rasterize_stream; measured 19 -> 14.6 ms for the
        1080p opaque raster vs dense).
      - "dma": bin_sorted segments walked by a per-tile double-buffered
        manual-DMA pipeline (tile_raster.rasterize_dma) — no dead grid
        steps, no per-tile cap, finer window granularity.
      - "dense": bin_all fixed-capacity slot tables + per-round merge —
        kept for A/B and small scenes.
    """
    tw, th = tile_raster.TILE_W, tile_raster.TILE_H
    mode = config.get("raster_mode", "stream")
    if mode == "dma":
        rb = rsetup.bin_sorted(
            valid, aabb, tiles_x=tiles_x, tiles_y=tiles_y,
            tile_w=tw, tile_h=th,
        )

        def raster(z_bounds=None, _rb=rb):
            d, t, _ = tile_raster.rasterize_dma(
                tri, aabb, *_rb[:5], tiles_y=tiles_y, tiles_x=tiles_x,
                z_bounds=z_bounds,
                dchunk=int(config.get("stream_chunk", 128)),
            )
            return d, t

        return raster, rb[5]  # small tris never drop; big-capacity only
    if mode == "stream":
        worklist = bool(config.get("raster_worklist", True))
        chunk = int(config.get("stream_chunk", 128 if worklist else 256))
        # the RESOLVE's per-window cost is dominated by fixed step overhead
        # (its one-hot MACs scale with total rows, not window size), so it
        # walks the SAME rows array in bigger windows; pad to the lcm
        rchunk = int(config.get("resolve_chunk", max(chunk, 256)))
        assert rchunk % chunk == 0, "resolve_chunk must be a multiple"
        kmax = max(1, -(-(capacity * rounds) // chunk))
        rb = rsetup.bin_sorted(
            valid, aabb, tiles_x=tiles_x, tiles_y=tiles_y,
            tile_w=tw, tile_h=th,
        )
        if worklist:
            overflow = rb[5]  # work-list grid has no kmax segment cap
        else:
            ends = rb[1].astype(jnp.int32) + rb[2].astype(jnp.int32)
            c0 = rb[1].astype(jnp.int32) // chunk
            overflow = (
                jnp.maximum(ends - (c0 + kmax) * chunk, 0).sum() + rb[5]
            )
        prebuilt = None
        if attrs is not None:
            rows, big_rows, na = tile_raster.build_stream_rows(
                tri, aabb, rb[0], rb[3], attrs=attrs,
                chunk=rchunk if worklist else chunk,
            )
            prebuilt = (rows, big_rows)

        def raster(z_bounds=None, _rb=rb):
            if worklist:
                d, t, _ = tile_raster.rasterize_worklist(
                    tri, aabb, *_rb[:5], tiles_y=tiles_y, tiles_x=tiles_x,
                    z_bounds=z_bounds, chunk=chunk, prebuilt=prebuilt,
                )
            else:
                d, t, _ = tile_raster.rasterize_stream(
                    tri, aabb, *_rb[:5], tiles_y=tiles_y, tiles_x=tiles_x,
                    z_bounds=z_bounds, chunk=chunk, kmax=kmax,
                    prebuilt=prebuilt,
                    mxu=bool(config.get("raster_mxu", False)),
                )
            return d, t

        if attrs is not None:
            raster.stream_bins = {
                "rows": rows, "big_rows": big_rows, "starts": rb[1],
                "counts": rb[2], "n_big": rb[4], "na": na,
                "chunk": rchunk if worklist else chunk, "kmax": kmax,
            }
            if worklist:
                # flag rides in the pytree STRUCTURE (key presence), not
                # as a bool leaf — per-node jits trace targets, and a
                # traced bool cannot drive the kernel dispatch
                raster.stream_bins["worklist_grid"] = ()
        return raster, overflow

    passes, overflow = rsetup.bin_all(
        valid, aabb, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_w=tw, tile_h=th, capacity=capacity, rounds=rounds,
    )

    def raster(z_bounds=None, _p=passes):
        return _raster_merge(tri, _p, tiles_y, tiles_x,
                             z_bounds=z_bounds, screen_aabb=aabb)

    return raster, overflow


def _queue_of_raster_tris(scene, tri):
    """Per-raster-triangle render-queue class, or None when the scene has a
    single (opaque) queue — the tag filter of RenderSceneNode.cpp:34-104."""
    mats = scene.materials
    if mats is None or not (mats.has_masked or mats.has_transparent):
        return None
    return mats.queue[scene.geometry.material_id[tri.src_id]]


@node("DepthPrepass")
class DepthPrepassNode(BaseNode):
    """Visibility raster: depth + triangle id (DepthPrepassNode.cpp).

    The reference draws depth-only with GPU culling, in two tag-filtered
    passes (Opaque then Masked, DefaultRenderer.renderer:93-372); here the
    visibility buffer doubles as the depth prepass AND the input to
    RenderScene's attribute resolve, so geometry is rasterized exactly once
    per frame. Masked materials raster as alpha-tested depth-peel layers:
    peel the nearest masked fragment, alpha-test it against the material
    cutoff (Standard.shader discard), and keep peeling pixels that failed.
    """

    def process(self, ctx, targets):
        scene = ctx.scene
        geo = scene.geometry
        vp = scene.frame.view_projection
        w, h = ctx.width, ctx.height
        pw = round_up(w, tile_raster.TILE_W)
        ph = round_up(h, tile_raster.TILE_H)
        tiles_x, tiles_y = pw // tile_raster.TILE_W, ph // tile_raster.TILE_H
        capacity = int(ctx.config.get("bin_capacity", 512))
        rounds = int(ctx.config.get("bin_rounds", 2))

        # Project against the FULL viewport; when running as a screen-row
        # shard, shift the setup into local rows (free: only the edge /
        # zplane constant terms change) and keep only triangles touching
        # the slice so boundary tile rows can't overflow with off-slice
        # geometry.
        tri, aabb = rsetup.triangle_setup(
            geo, vp, width=w, height=ctx.fh, cull="back"
        )
        # HiZ occlusion culling against the PREVIOUS frame's min-pyramid
        # (ComputeMeshCulling.shader analog; see raster/hiz_cull.py). The
        # pyramid rides through temporal state (FULL-height even when
        # sharded — gathered in process_sharded); test in global rows
        # BEFORE the shard row-shift rewrites edge/zplane constants.
        state = ctx.state or {}
        hiz_mask = None
        if ctx.config.get("hiz_culling", True) and "hiz/mip0" in state:
            from sailor_tpu.raster import hiz_cull

            mips = [state[k] for k in sorted(state) if k.startswith("hiz/mip")]
            flat, offsets, shapes = hiz_cull.build_flat_pyramid(mips)
            hiz_mask = hiz_cull.occlusion_cull(
                tri.valid, aabb, tri.zmax, flat,
                offsets=offsets, shapes=shapes, base_w=w, base_h=ctx.fh,
            )
        if ctx.sharded:
            xmin, xmax, ymin, ymax = aabb
            tri = rsetup.shift_viewport_rows(tri, ctx.row0)
            in_slice = (ymax >= ctx.row0) & (ymin < ctx.row0 + h)
            tri = tri.replace(valid=tri.valid & in_slice)
            aabb = (xmin, xmax, ymin - ctx.row0, ymax - ctx.row0)
        queue_of = _queue_of_raster_tris(scene, tri)
        opaque_valid = tri.valid if queue_of is None else tri.valid & (queue_of == 0)

        if hiz_mask is not None:
            culled_valid = opaque_valid & hiz_mask
            targets["HiZCulledCount"] = jnp.sum(
                opaque_valid & ~culled_valid, dtype=jnp.int32
            )
            opaque_valid = culled_valid

        # Fused visibility resolve (resolve_gbuffer_stream): share ONE
        # combined row gather between the raster and RenderScene's
        # attribute expansion. Every queue that can win the visibility
        # buffer contributes its bin set (opaque here; masked peel below)
        # — a pixel's winner matches in exactly one, the rest add zeros.
        attrs = None
        if (ctx.config.get("fused_resolve", True)
                and ctx.config.get("raster_mode", "stream") == "stream"):
            # pre-packed source table: one row gather instead of ~15
            # per-frame attribute gathers (pack_source_attributes). The
            # width check guards scenes whose materials were swapped in
            # AFTER SceneView.create (scene.replace(materials=...)) — a
            # stale material-less table must not feed a material resolve.
            want = 49 if scene.materials is not None else 37
            if (scene.attrs_packed is not None
                    and scene.attrs_packed.shape[1] == want):
                attrs = scene.attrs_packed[tri.src_id]
            else:
                attrs = interpolate.pack_triangle_attributes(
                    geo, tri.src_id, scene.materials
                )
        raster, overflow = _make_raster(
            tri, opaque_valid, aabb, tiles_y, tiles_x, ctx.config,
            capacity=capacity, rounds=rounds, attrs=attrs,
        )
        if attrs is not None:
            # targets may cross separate per-node jits (process_pernode):
            # keep ONLY arrays in the dict; the static shape facts travel
            # via the shared config object (written at trace time, before
            # any consumer node traces)
            sb0 = dict(raster.stream_bins)
            ctx.config["_fused_meta"] = [
                {k: sb0.pop(k) for k in ("na", "chunk", "kmax")}
            ]
            targets["StreamBins"] = [sb0]
        # surfaced so callers/tests can assert nothing was dropped
        targets["BinOverflow"] = overflow
        depth, tid = raster()
        depth, tid = depth[:h, :w], tid[:h, :w]

        mats = scene.materials
        if queue_of is not None and mats.has_masked:
            masked_valid = tri.valid & (queue_of == 1)
            raster_m, _ = _make_raster(
                tri, masked_valid, aabb, tiles_y, tiles_x, ctx.config,
                capacity=capacity, attrs=attrs,
            )
            if attrs is not None:
                sbm = dict(raster_m.stream_bins)
                ctx.config["_fused_meta"].append(
                    {k: sbm.pop(k) for k in ("na", "chunk", "kmax")}
                )
                targets["StreamBins"].append(sbm)
            inv_vp = jnp.linalg.inv(vp)
            cam = scene.frame.camera_position

            def peel_layer(carry):
                depth, tid, zhi, undecided = carry
                d_k, t_k = raster_m((depth, zhi))
                d_k, t_k = d_k[:h, :w], t_k[:h, :w]
                if attrs is not None:
                    # stream-expanded alpha: no per-layer (H*W)-row gather
                    alpha, cutoff = interpolate.resolve_alpha_stream(
                        raster_m.stream_bins, t_k, inv_vp, cam, mats,
                        width=w, height=h, tiles_y=tiles_y, tiles_x=tiles_x,
                        full_height=ctx.full_height, row0=ctx.row0,
                    )
                else:
                    alpha, cutoff = interpolate.resolve_alpha(
                        geo, tri, t_k, inv_vp, cam, mats, ctx.row0,
                        ctx.full_height
                    )
                hit = t_k >= 0
                passed = hit & (alpha >= cutoff) & undecided
                return (
                    jnp.where(passed, d_k, depth),
                    jnp.where(passed, t_k, tid),
                    jnp.where(hit, d_k, 0.0),
                    undecided & hit & ~passed,
                )

            carry = (depth, tid, jnp.full((h, w), 2.0),
                     jnp.ones((h, w), bool))
            for layer in range(int(ctx.config.get("masked_layers", 3))):
                # early-out: when a layer leaves no undecided pixels the
                # remaining peels are skipped at runtime (lax.cond takes
                # one branch; layer 0 always runs — all pixels undecided)
                if layer == 0:
                    carry = peel_layer(carry)
                else:
                    carry = jax.lax.cond(
                        jnp.any(carry[3]), peel_layer, lambda c: c, carry
                    )
            depth, tid = carry[0], carry[1]

        targets["Depth"] = depth
        targets["TriId"] = tid
        targets["TriSetup"] = tri
        targets["TriAABB"] = aabb
        return targets


@node("LinearizeDepth")
class LinearizeDepthNode(BaseNode):
    def process(self, ctx, targets):
        znf = ctx.scene.frame.camera_z_near_far
        targets["LinearDepth"] = pp.linearize_depth(
            targets["Depth"], znf[0], znf[1]
        )
        return targets


@node("LightCulling")
class LightCullingNode(BaseNode):
    """Tiled light culling (LightCullingNode.cpp -> kernels/light_culling)."""

    def process(self, ctx, targets):
        w, h = ctx.width, ctx.height
        t = cfg.LIGHTS_CULLING_TILE_SIZE
        lin = targets["LinearDepth"]
        ph, pw = round_up(h, t), round_up(w, t)
        if (ph, pw) != lin.shape:
            lin = jnp.pad(lin, ((0, ph - h), (0, pw - w)), constant_values=1e4)
        idx, counts = light_culling.cull_lights(
            ctx.scene.lights,
            ctx.scene.frame.view,
            ctx.scene.frame.inv_projection,
            lin,
            tiles_y=ph // t,
            tiles_x=pw // t,
            viewport=(w, ctx.fh),
            max_per_tile=int(ctx.config.get("max_lights_per_tile", cfg.LIGHTS_PER_TILE)),
            row0=ctx.row0,
            # two-level cull: supertile shortlist bounds the per-tile sort
            # width (the node's dominant cost at 1k lights); 0 disables
            coarse_capacity=int(ctx.config.get("light_coarse_capacity", 256)),
        )
        targets["LightIndices"] = idx
        targets["LightCounts"] = counts
        return targets


@node("ShadowPrepass")
class ShadowPrepassNode(BaseNode):
    """CSM cascades + EVSM for cascade 0 (ShadowPrepassNode.cpp)."""

    def process(self, ctx, targets):
        scene = ctx.scene
        znf = scene.frame.camera_z_near_far
        sun_dir = scene.sky.sun_direction
        mats = shadow_k.cascade_matrices(
            scene.frame.view, scene.frame.projection, sun_dir,
            float(ctx.config.get("z_near", 0.1)),
            float(ctx.config.get("z_far", 100.0)),
        )
        s = int(ctx.config.get("shadow_resolution", 1024))
        ps = round_up(s, tile_raster.TILE_W)
        tiles = ps // tile_raster.TILE_W
        tiles_y = round_up(s, tile_raster.TILE_H) // tile_raster.TILE_H
        capacity = int(ctx.config.get("shadow_bin_capacity", 512))

        # All four cascades raster in ONE vmapped pass (setup, binning and
        # the Pallas kernel batch over the cascade axis) — 4x fewer
        # dispatches than a per-cascade loop.
        def one_cascade(mat):
            tri, aabb = rsetup.triangle_setup(
                scene.geometry, mat, width=s, height=s, cull="none",
                clip=False,  # ortho light projection: w == 1, no near clip
            )
            raster, _ = _make_raster(
                tri, tri.valid, aabb, tiles_y, tiles, ctx.config,
                capacity=capacity,
            )
            return raster()[0][:s, :s]

        radius = int(ctx.value("Shadow.EvsmBlurRadius", 4))
        n_mesh = ctx.mesh_size if ctx.mesh_axis else 1
        C = cfg.NUM_CSM_CASCADES

        def evsm_of(maps):
            # EVSM moments for EVERY cascade (the reference blurs cascade 0
            # only and PCFs the rest; all-EVSM turns the per-pixel shadow
            # factor into ONE gather — see csm_shadow_factor_evsm). The
            # blur is separable pad+slice traffic, cheap on this side.
            mom = shadow_k.evsm_warp(maps)  # (C, S, S, 4)
            return blur_k.blur_1d(blur_k.blur_1d(mom, radius, 1), radius, 2)

        def render_all(_):
            maps = jnp.stack([one_cascade(mats[c]) for c in range(C)])
            return maps, evsm_of(maps)

        if n_mesh > 1:
            # Cascades sharded over the screen axis instead of replicated:
            # chip i rasters+warps+blurs cascades (i*k+j) % C and the full
            # (C, S, S[, 4]) tables reassemble with ONE psum. The psum runs
            # unconditionally OUTSIDE the cache cond (a collective inside
            # one lax.cond branch would desync the SPMD channel program);
            # the cached branch feeds cached/n so psum(cached/n) == cached.
            k = -(-C // n_mesh)
            import numpy as _np

            counts = _np.zeros(C, _np.int64)
            for i in range(n_mesh):
                for j in range(k):
                    counts[(i * k + j) % C] += 1
            inv_counts = jnp.asarray(1.0 / counts, jnp.float32)

            def render_partial(_):
                idx = jax.lax.axis_index(ctx.mesh_axis)
                maps_p = jnp.zeros((C, s, s), jnp.float32)
                mom_p = jnp.zeros((C, s, s, 4), jnp.float32)
                for j in range(k):
                    c = (idx * k + j) % C
                    m_loc = one_cascade(jnp.take(mats, c, axis=0))
                    mm = evsm_of(m_loc[None])
                    w_c = inv_counts[c]
                    maps_p = jax.lax.dynamic_update_slice(
                        maps_p, (m_loc * w_c)[None], (c, 0, 0)
                    )
                    mom_p = jax.lax.dynamic_update_slice(
                        mom_p, mm * w_c, (c, 0, 0, 0)
                    )
                return maps_p, mom_p

        state = ctx.state or {}
        cache_on = ctx.config.get("csm_cache", True) and "csm/maps" in state
        if n_mesh > 1:
            body = render_partial
            cached = lambda _: (
                state["csm/maps"] / n_mesh, state["csm/evsm"] / n_mesh,
            )
        else:
            body = render_all
            cached = lambda _: (state["csm/maps"], state["csm/evsm"])
        if cache_on:
            # Change-snapshot caching (LightingECS.cpp:262-371 CSMLightState
            # ::Equals): when the cascade matrices AND the geometry are
            # unchanged since last frame, reuse the cached maps — a static
            # camera skips the entire 4-cascade raster (~25 ms at 1024^2).
            # Signature must change under ANY rigid motion of any object.
            # sum(p) = V*centroid misses rotations about the centroid and
            # sum(p*p) is rotation-invariant too (advisor r2) — fold in a
            # dot with fixed per-vertex pseudo-random weights: a rotation
            # moves each vertex differently against its own weight.
            pos = scene.geometry.position
            widx = jnp.arange(pos.shape[0], dtype=jnp.float32)[:, None]
            wgt = jnp.sin(widx * 12.9898 + jnp.arange(3.0)[None, :] * 78.233)
            geo_sig = jnp.stack([
                jnp.sum(pos * 0.37331),
                jnp.sum(pos * wgt) * 0.11217,
                jnp.float32(scene.geometry.indices.shape[0]),
            ])
            key = jnp.concatenate([mats.reshape(-1), geo_sig])
            prev_key = state["csm/key"]
            dirty = jnp.any(jnp.abs(key - prev_key) > 0.0)
            maps, moments = jax.lax.cond(dirty, body, cached, operand=None)
        else:
            maps, moments = body(None)
        if n_mesh > 1:
            maps = jax.lax.psum(maps, ctx.mesh_axis)
            moments = jax.lax.psum(moments, ctx.mesh_axis)
        if cache_on:
            out = targets.setdefault("state_out", {})
            out["csm/maps"] = maps
            out["csm/evsm"] = moments
            out["csm/key"] = key

        targets["ShadowMaps"] = maps
        targets["LightMatrices"] = mats
        targets["EvsmMaps"] = moments
        targets["EvsmMap"] = moments[0]
        return targets


@node("Sky")
class SkyNode(BaseNode):
    """Procedural sky for background pixels (SkyNode.cpp)."""

    def process(self, ctx, targets):
        w, h = ctx.width, ctx.height
        # The reference renders the sky at HALF resolution (SkyNode.cpp
        # creates half-size targets); match it: atmosphere/clouds are
        # low-frequency, and the gather-free pow2 upsample is ~free.
        q = max(1, int(ctx.config.get("sky_downsample", 2)))
        hq, wq = -(-h // q), -(-w // q)
        inv_vp = jnp.linalg.inv(ctx.scene.frame.view_projection)
        cam = ctx.scene.frame.camera_position
        use_stars = ctx.scene.star_dirs.shape[0] > 0
        with_clouds = bool(ctx.config.get("sky_clouds", True))
        cs = int(ctx.config.get("cloud_stride", 2))

        def render_sky(_):
            d = interpolate.pixel_rays_strided(
                inv_vp, cam, h, w, q, ctx.row0, ctx.full_height,
            ) if q > 1 else interpolate.pixel_rays(
                inv_vp, cam, h, w, ctx.row0, ctx.full_height,
            )
            cloud_override = None
            if with_clouds and cs > 1:
                # clouds marched at a further 1/cs of the sky buffer;
                # upsample in the node so sharded slices stay
                # boundary-exact
                d_c = interpolate.pixel_rays_strided(
                    inv_vp, cam, h, w, q * cs, ctx.row0, ctx.full_height,
                )
                cl_q, ct_q = sky_k.clouds(
                    d_c, ctx.scene.sky, ctx.scene.frame.current_time
                )
                cl = ctx.upsample(cl_q, (hq, wq))
                ct = ctx.upsample(ct_q[..., None], (hq, wq))[..., 0]
                cloud_override = (cl, ct)
            color = sky_k.sky_radiance(
                d, ctx.scene.sky, ctx.scene.frame.current_time,
                ctx.scene.star_dirs if use_stars else None,
                ctx.scene.star_colors if use_stars else None,
                with_clouds=with_clouds,
                with_stars=use_stars,
                cloud_override=cloud_override,
            )
            if q > 1:
                color = ctx.upsample(color, (h, w))
            return color

        state = ctx.state or {}
        if ctx.config.get("sky_cache", True) and "sky/buf" in state:
            # Change-snapshot cache (same pattern as the CSM cache): the
            # sky depends only on RAY DIRECTIONS, sun and cloud time — a
            # translating camera reuses last frame's buffer. Key = the 4
            # corner ray directions (they pin the projective ray grid),
            # sun params, and cloud time quantized to sky_cache_hz so the
            # FBM drift re-renders at a low fixed rate (the reference
            # updates its env cubemap one face per frame in the same
            # spirit, SkyNode.h m_updateEnvCubemapPattern).
            p = ctx.scene.sky
            # row0=0 so every shard computes the SAME key (replicated
            # state); 4 distinct rays pin the projective ray grid.
            # Quantized to 1e-5: a pure camera TRANSLATION leaves ray
            # directions algebraically unchanged but numerically off by
            # ~1e-7 through the inv_vp round trip — quantization keeps it
            # a cache hit, while any real rotation (>=1e-4 rad/frame at
            # interactive rates) still flips the key.
            corners = jnp.round(
                interpolate.pixel_rays_strided(
                    inv_vp, cam, 2, 2, 1, 0, ctx.full_height,
                ).reshape(-1) * 1e5
            )
            hz = float(ctx.config.get("sky_cache_hz", 4.0))
            tq = jnp.floor(ctx.scene.frame.current_time * hz) \
                if with_clouds else jnp.float32(0.0)
            key = jnp.concatenate([
                corners, p.sun_direction,
                jnp.stack([jnp.asarray(p.sun_intensity, jnp.float32),
                           jnp.asarray(p.clouds_coverage, jnp.float32),
                           jnp.asarray(tq, jnp.float32)]),
            ])
            dirty = jnp.any(jnp.abs(key - state["sky/key"]) > 0.0)

            def cached_sky(_):
                # state holds the FULL-height buffer (gathered when
                # sharded); each shard reuses its own row slice
                return jax.lax.dynamic_slice(
                    state["sky/buf"],
                    (jnp.asarray(ctx.row0, jnp.int32), 0, 0), (h, w, 3),
                )

            color = jax.lax.cond(dirty, render_sky, cached_sky, operand=None)
            out = targets.setdefault("state_out", {})
            out["sky/buf"] = color
            out["sky/key"] = key
        else:
            color = render_sky(None)
        targets["Sky"] = color
        return targets


@node("Environment")
class EnvironmentNode(BaseNode):
    """IBL bake, cached per sky params (EnvironmentNode.cpp caching).

    The bake runs in ``prepare`` (host side, eager) only when the sky hash
    changes; the baked maps ride through ``state`` so the jitted graph
    treats them as inputs.
    """

    # per-instance bake cache (set lazily); two graphs with different skies
    # must not clobber each other's bakes.
    _cache_key = None
    _cache = None
    _next_face = 0
    _pending_key = None

    def _derive(self, env, res):
        """Irradiance/spec/LUT from an env cube (the expensive half)."""
        irr = ibl_k.irradiance_map(env, resolution=16, samples=128)
        mips = ibl_k.prefiltered_env_mips(env, num_mips=4, samples=32)
        lut = ibl_k.brdf_lut(resolution=64, samples=128)
        # pack prefiltered mips at ONE resolution so runtime sampling is a
        # flat 2-lod gather (see cubemap.sample_cubemap_lod_stack)
        stack = jnp.stack([cm.upsample_cubemap(m, res) for m in mips])
        return {
            "env/cube": env,
            "env/irradiance": irr,
            # SH9 projection: the diffuse term evaluates analytically per
            # pixel (9 FMAs) instead of sampling the irradiance cube
            "env/sh9": ibl_k.sh9_project(env),
            "env/brdf_lut": lut,
            "env/spec_stack": stack,
            **{f"env/mip{i}": m for i, m in enumerate(mips)},
        }

    def prepare(self, ctx):
        import numpy as np

        p = ctx.scene.sky
        res = int(ctx.config.get("env_resolution", 64))
        # cache key via SCALAR pulls only: bulk-array device->host reads
        # (np.asarray on a jnp array) intermittently stall forever over
        # the axon tunnel (observed: warm-probe hung here >400 s);
        # float() scalar pulls are the tunnel's reliable sync primitive.
        key = (res,) + tuple(
            round(float(v), 4)
            for v in (p.sun_direction[0], p.sun_direction[1],
                      p.sun_direction[2], p.sun_intensity,
                      p.clouds_coverage)
        )
        if key == self._cache_key:
            # still publish into THIS graph's state: a fresh FrameGraph that
            # hits the cache must see the env maps too.
            ctx.state.update(self._cache)
            return

        def radiance(d):
            return sky_k.sky_radiance(d, p, 0.0, with_clouds=False)

        if self._cache is not None and ctx.config.get("env_incremental", True):
            # Incremental face-by-face refresh (SkyNode.h:141,173
            # m_updateEnvCubemapPattern): a changed sky re-renders ONE
            # cubemap face per frame into the cached cube; the derived IBL
            # maps recompute when the sweep completes. A moving sun costs
            # 1/6th of a bake per frame instead of a full-frame hitch.
            if key != self._pending_key:
                self._pending_key = key
                self._next_face = 0
            face = self._next_face
            d = cm.face_directions(res)[face]
            env = self._cache["env/cube"].at[face].set(radiance(d))
            self._next_face += 1
            if self._next_face >= 6 and key == self._pending_key:
                # mark clean ONLY when the key held for the whole sweep —
                # the reset above restarts on any mid-sweep change, so all
                # six faces were rendered under this exact key (advisor r2)
                self._cache = self._derive(env, res)
                self._cache_key = key
                self._pending_key = None
                self._next_face = 0
            else:
                self._cache = dict(self._cache)
                self._cache["env/cube"] = env
            ctx.state.update(self._cache)
            return

        env = cm.render_cubemap(radiance, res)
        self._cache = self._derive(env, res)
        self._cache_key = key
        ctx.state.update(self._cache)

    def process(self, ctx, targets):
        # maps already live in state; nothing traced to do
        return targets


@node("PostProcess")
class PostProcessNode(BaseNode):
    """Generic fullscreen pass selected by `shader` (PostProcessNode.cpp)."""

    def process(self, ctx, targets):
        shader = self.p("shader", "")
        if shader == "HBAO":
            # Half-res AO: the 8-dir x 4-step horizon march is 32 shifted
            # passes over view-space positions — quartering the pixel count
            # saves ~3 ms at 1080p, and the blur+bilinear upsample hides
            # the difference (the reference also smooths AO aggressively).
            q = int(ctx.config.get("ao_stride", 2))
            ld = targets["LinearDepth"]
            if q > 1:
                ld = jax.lax.reduce_window(
                    ld, 0.0, jax.lax.add, (q, q), (q, q), "VALID"
                ) * (1.0 / (q * q))
            hq, wq = ctx.height // q, ctx.width // q
            if ctx.sharded and q > 1:
                # half-res depth is small (2 MB at 1080p): all_gather it
                # and run the full-frame pass on every chip, then slice
                # local rows — bit-identical to single-device by
                # construction, and immune to the 17-row halo exceeding a
                # thin slice (the fatal case for ppermute halos at q=2)
                ld_full = jax.lax.all_gather(
                    ld, ctx.mesh_axis, axis=0, tiled=True
                )
                ao_full = pp.hbao(
                    ld_full, ctx.scene.frame.inv_projection,
                    height=ctx.fh // q, width=wq,
                    radius=float(ctx.value("AO.Radius", 0.5)),
                    power=float(ctx.value("AO.Power", 1.5)),
                )
                ao_q = jax.lax.dynamic_slice_in_dim(
                    ao_full, ctx.row0 // q, hq, axis=0
                )
            elif ctx.sharded:
                ao_q = pp.hbao_sharded(
                    ld, ctx.scene.frame.inv_projection,
                    height=hq, width=wq,
                    radius=float(ctx.value("AO.Radius", 0.5)),
                    power=float(ctx.value("AO.Power", 1.5)),
                    axis_name=ctx.mesh_axis, n_shards=ctx.mesh_size,
                    row0=ctx.row0, full_height=ctx.fh,
                )
            else:
                ao_q = pp.hbao(
                    ld,
                    ctx.scene.frame.inv_projection,
                    height=hq, width=wq,
                    radius=float(ctx.value("AO.Radius", 0.5)),
                    power=float(ctx.value("AO.Power", 1.5)),
                )
            targets["AO"] = (
                ctx.upsample(ao_q[..., None], (ctx.height, ctx.width))[..., 0]
                if q > 1 else ao_q
            )
        elif shader == "HBAO_Blur":
            axis = 0 if self.p("direction", "V") == "V" else 1
            if ctx.sharded and axis == 0:
                targets["AO"] = blur_k.blur_rows_sharded(
                    targets["AO"], 4, ctx.mesh_axis, ctx.mesh_size
                )
            else:
                targets["AO"] = blur_k.blur_1d(targets["AO"], 4, axis)
        elif shader == "MotionBlur":
            inv_vp = jnp.linalg.inv(ctx.scene.frame.view_projection)
            quarter_full = None
            if ctx.sharded:
                q_local = pp.downsample_quarter(targets["Main"])
                quarter_full = jax.lax.all_gather(
                    q_local, ctx.mesh_axis, axis=0, tiled=True
                )
            targets["Main"] = pp.motion_blur(
                targets["Main"], targets["Depth"],
                ctx.scene.prev_frame.view_projection, inv_vp,
                intensity=float(ctx.value("MotionBlur.Intensity", 1.0)),
                num_samples=4,
                row0=ctx.row0, full_height=ctx.full_height,
                quarter_full=quarter_full,
                axis_name=ctx.mesh_axis, n_shards=ctx.mesh_size,
            )
        elif shader == "SunShafts":
            targets["Main"] = pp.sun_shafts(
                targets["Main"], targets["Depth"],
                ctx.scene.frame.view_projection,
                ctx.scene.sky.sun_direction,
                ctx.scene.sky.sun_intensity * jnp.asarray([1.0, 0.9, 0.75]),
                intensity=float(ctx.value("SunShafts.Intensity", 0.45)),
                num_samples=int(ctx.value("SunShafts.Distance", 24)),
                row0=ctx.row0, full_height=ctx.full_height,
                axis_name=ctx.mesh_axis, n_shards=ctx.mesh_size,
            )
        elif shader == "ChromaticAberration":
            targets["Main"] = pp.chromatic_aberration(
                targets["Main"], float(ctx.value("CA.Strength", 0.003))
            )
        elif shader == "Debug":
            # Debug compose (Debug.shader AO / LIGHT_TILES / CASCADES
            # defines): visualize an intermediate buffer over the LDR
            # frame. Mode is a node param so the editor/console can flip
            # it; "none" is a passthrough (the reference's default).
            mode = self.p("mode", "none")
            dst = "Final" if "Final" in targets else "Main"
            if mode == "ao" and "AO" in targets:
                targets[dst] = jnp.repeat(
                    targets["AO"][..., None], 3, axis=-1
                )
            elif mode == "light_tiles" and "LightCounts" in targets:
                from sailor_tpu import config as _cfg

                t = _cfg.LIGHTS_CULLING_TILE_SIZE
                z_far = float(ctx.config.get("z_far", 150.0))
                base = targets["LinearDepth"] / z_far
                heat = jnp.repeat(
                    jnp.repeat(
                        targets["LightCounts"].astype(jnp.float32), t, 0
                    ), t, 1
                )[: ctx.height, : ctx.width] * 0.05
                targets[dst] = jnp.stack(
                    [base + heat, base + heat, base], axis=-1
                )
            elif mode == "cascades" and "ShadowMaps" in targets:
                from sailor_tpu.kernels import shadow as _sh

                # color by selected cascade (green/yellow/cyan/red),
                # modulated by the LDR luma underneath
                z_far = float(ctx.config.get("z_far", 150.0))
                lin = targets["LinearDepth"]
                layer = jnp.full(lin.shape, len(_sh.config.SHADOW_CASCADE_LEVELS),
                                 jnp.int32)
                for i in reversed(range(len(_sh.config.SHADOW_CASCADE_LEVELS))):
                    layer = jnp.where(
                        lin < z_far * _sh.config.SHADOW_CASCADE_LEVELS[i],
                        i, layer,
                    )
                palette = jnp.asarray(
                    [[0, 1, 0], [1, 1, 0], [0, 1, 1], [1, 0, 0], [1, 1, 1]],
                    jnp.float32,
                )
                luma = jnp.clip(
                    targets[dst].mean(-1, keepdims=True), 0.15, 1.0
                )
                targets[dst] = palette[jnp.minimum(layer, 4)] * luma
        else:
            raise KeyError(f"unknown PostProcess shader '{shader}'")
        return targets


@node("RenderScene")
class RenderSceneNode(BaseNode):
    """Forward+ shading of the visibility buffer (RenderSceneNode.cpp)."""

    def process(self, ctx, targets):
        scene = ctx.scene
        inv_vp = jnp.linalg.inv(scene.frame.view_projection)
        if "StreamBins" in targets:
            # fused path: expand winner rows from the tile bin windows in
            # VMEM instead of the (H*W)-row latency-bound random gather.
            # pop: the 100 MB row table must not outlive the resolve.
            sb = [dict(arrays, **meta) for arrays, meta in
                  zip(targets.pop("StreamBins"), ctx.config["_fused_meta"])]
            pw = round_up(ctx.width, tile_raster.TILE_W)
            ph = round_up(ctx.height, tile_raster.TILE_H)
            gbuffer, uv, mat_id = interpolate.resolve_gbuffer_stream(
                sb, targets["TriId"], inv_vp, scene.frame.camera_position,
                materials=scene.materials,
                width=ctx.width, height=ctx.height,
                tiles_y=ph // tile_raster.TILE_H,
                tiles_x=pw // tile_raster.TILE_W,
                full_height=ctx.full_height, row0=ctx.row0,
            )
        else:
            gbuffer, uv, mat_id = interpolate.resolve_gbuffer(
                scene.geometry, targets["TriSetup"], targets["TriId"],
                inv_vp, scene.frame.camera_position,
                materials=scene.materials,
                full_height=ctx.full_height, row0=ctx.row0,
            )
        if "AO" in targets:
            gbuffer = gbuffer.replace(ao=targets["AO"])

        # Coverage-weighted mean-pool for the half/quarter-res terms.
        # Strided slices ([::2, ::2]) on the resolved planes lowered to
        # per-pixel index GATHERS in this fusion context (~5-12 ms EACH at
        # 1080p, ~37 ms total, profiled); and 5-D reshape+reduce pooling
        # cost ~11 ms in layout copies. reduce_window has only a dense
        # windowed lowering — it can't regress into either.
        def pool(x, q, w=None):
            win = (q, q) + (1,) * (x.ndim - 2)
            xs = x if w is None else x * (
                w if x.ndim == 2 else w[..., None]
            )
            s = jax.lax.reduce_window(
                xs, 0.0, jax.lax.add, win, win, "VALID"
            )
            if w is None:
                return s / (q * q)
            sw = jax.lax.reduce_window(
                w, 0.0, jax.lax.add, (q, q), (q, q), "VALID"
            )
            return s / jnp.maximum(sw if x.ndim == 2 else sw[..., None], 1e-6)

        cov = gbuffer.coverage

        def pooled_inputs(q):
            wpos_q = pool(gbuffer.world_position, q, cov)
            n_q = m3.normalize(pool(gbuffer.normal, q, cov))
            return wpos_q, n_q

        # CSM shadow factor for the sun — computed at reduced resolution
        # and upsampled (the EVSM moments are pre-blurred and the factor
        # gather is HBM-latency bound, so pixel count is the direct cost:
        # stride 4 cuts the 522k-row gather to 131k, ~7 ms at 1080p).
        sq = int(ctx.config.get("shadow_stride", 4))
        shadow = None
        if "EvsmMaps" in targets:
            wpos_h, n_h = pooled_inputs(sq)
            shadow_q = shadow_k.csm_shadow_factor_evsm(
                wpos_h, n_h,
                scene.frame.view,
                scene.sky.sun_direction, targets["LightMatrices"],
                targets["EvsmMaps"],
                z_far=float(ctx.config.get("z_far", 100.0)),
            )
            shadow = ctx.upsample(shadow_q, (ctx.height, ctx.width))
        elif "ShadowMaps" in targets:
            wpos_h, n_h = pooled_inputs(sq)
            shadow_q = shadow_k.csm_shadow_factor(
                wpos_h, n_h,
                scene.frame.view,
                scene.sky.sun_direction, targets["LightMatrices"],
                targets["ShadowMaps"], targets.get("EvsmMap"),
                z_far=float(ctx.config.get("z_far", 100.0)),
                use_evsm=True,
            )
            shadow = ctx.upsample(shadow_q, (ctx.height, ctx.width))

        # IBL ambient if the environment bake is present. Computed at
        # quarter resolution and bilinearly upsampled: the ambient term is
        # low-frequency and its ~100 cubemap gathers per pixel dominated the
        # frame at full res (the reference renders HBAO/sky half-res for the
        # same reason).
        ibl_ambient = None
        state = ctx.state or {}
        if "env/irradiance" in state:
            q = int(ctx.config.get("ibl_stride", 4))
            wpos_q, n_q = pooled_inputs(q)
            view_dir_q = m3.normalize(
                wpos_q - scene.frame.camera_position
            )
            alb_q = pool(gbuffer.albedo, q, cov)
            met_q = pool(gbuffer.metallic, q, cov)
            rough_q = pool(gbuffer.roughness, q, cov)
            ao_q = pool(gbuffer.ao, q, cov)
            if "env/spec_stack" in state:
                amb_q = ibl_k.ambient_ibl_packed(
                    alb_q, met_q, rough_q, ao_q, n_q, view_dir_q,
                    state["env/irradiance"], state["env/spec_stack"],
                    irradiance_sh=state.get("env/sh9"),
                )
            else:
                mips = [state[k] for k in sorted(state) if k.startswith("env/mip")]
                amb_q = ibl_k.ambient_ibl(
                    alb_q, met_q, rough_q, ao_q, n_q, view_dir_q,
                    state["env/irradiance"], mips, state["env/brdf_lut"],
                )
            ibl_ambient = ctx.upsample(
                amb_q, (ctx.height, ctx.width)
            ) * gbuffer.coverage[..., None]

        t = cfg.LIGHTS_CULLING_TILE_SIZE
        ph, pw = round_up(ctx.height, t), round_up(ctx.width, t)
        gb_p = gbuffer
        if (ph, pw) != (ctx.height, ctx.width):

            def pad2(x, v=0.0):
                padw = [(0, ph - ctx.height), (0, pw - ctx.width)] + [(0, 0)] * (x.ndim - 2)
                return jnp.pad(x, padw, constant_values=v)

            gb_p = jax.tree.map(pad2, gbuffer)
            shadow = pad2(shadow) if shadow is not None else None
            ibl_ambient = pad2(ibl_ambient) if ibl_ambient is not None else None

        if ctx.config.get("pallas_shading", False):
            from sailor_tpu.kernels import pbr_pallas

            hdr = pbr_pallas.shade_forward_plus_pallas(
                gb_p, scene.lights, targets["LightIndices"],
                scene.frame.camera_position,
                shadow_factors=shadow,
                ibl_ambient=ibl_ambient,
                tile_light_counts=targets.get("LightCounts"),
            )[: ctx.height, : ctx.width]
        else:
            hdr = pbr.shade_forward_plus(
                gb_p, scene.lights, targets["LightIndices"],
                scene.frame.camera_position,
                shadow_factors=shadow,
                ibl_ambient=ibl_ambient,
            )[: ctx.height, : ctx.width]

        # compose over the sky background
        if "Sky" in targets:
            covered = gbuffer.coverage[..., None]
            hdr = hdr * covered + targets["Sky"] * (1.0 - covered)
        targets["Main"] = hdr
        return targets


@node("RenderTransparent")
class RenderTransparentNode(BaseNode):
    """Transparent render queue: K-layer depth peel + back-to-front blend.

    The reference tags materials Transparent and blends them after the
    opaque scene (Types.h:524-580 RenderState blend modes;
    RenderSceneNode.cpp tag filter). A TPU visibility buffer can't blend
    in raster order, so the nearest K transparent layers are peeled with
    the z-bounded raster, each layer is resolved + Forward+ shaded, and
    layers composite back-to-front over Main with per-pixel alpha
    (albedo.a x vertex color.a x material opacity).
    """

    def process(self, ctx, targets):
        scene = ctx.scene
        mats = scene.materials
        if mats is None or not mats.has_transparent:
            return targets
        geo = scene.geometry
        w, h = ctx.width, ctx.height
        pw = round_up(w, tile_raster.TILE_W)
        ph = round_up(h, tile_raster.TILE_H)
        tiles_x, tiles_y = pw // tile_raster.TILE_W, ph // tile_raster.TILE_H

        # Transparent surfaces render two-sided (you see the inside of a
        # glass sphere through its front) — fresh setup with cull="none".
        tri, aabb = rsetup.triangle_setup(
            geo, scene.frame.view_projection, width=w, height=ctx.fh,
            cull="none",
        )
        if ctx.sharded:
            xmin, xmax, ymin, ymax = aabb
            tri = rsetup.shift_viewport_rows(tri, ctx.row0)
            in_slice = (ymax >= ctx.row0) & (ymin < ctx.row0 + h)
            tri = tri.replace(valid=tri.valid & in_slice)
            aabb = (xmin, xmax, ymin - ctx.row0, ymax - ctx.row0)
        tvalid = tri.valid & (
            mats.queue[geo.material_id[tri.src_id]] == 2
        )
        t_attrs = None
        if (ctx.config.get("fused_resolve", True)
                and ctx.config.get("raster_mode", "stream") == "stream"):
            # own src_id map (two-sided setup), same source table
            want = 49 if mats is not None else 37
            if (scene.attrs_packed is not None
                    and scene.attrs_packed.shape[1] == want):
                t_attrs = scene.attrs_packed[tri.src_id]
            else:
                t_attrs = interpolate.pack_triangle_attributes(
                    geo, tri.src_id, mats
                )
        raster_t, _ = _make_raster(
            tri, tvalid, aabb, tiles_y, tiles_x, ctx.config,
            capacity=int(ctx.config.get("bin_capacity", 512)),
            attrs=t_attrs,
        )
        K = int(ctx.config.get("transparent_layers", 3))
        zlo = targets["Depth"]
        zhi = jnp.full((h, w), 2.0)
        layers = []
        for _ in range(K):
            d_k, t_k = raster_t((zlo, zhi))
            d_k, t_k = d_k[:h, :w], t_k[:h, :w]
            layers.append(t_k)
            zhi = jnp.where(t_k >= 0, d_k, 0.0)

        inv_vp = jnp.linalg.inv(scene.frame.view_projection)
        cam = scene.frame.camera_position
        t = cfg.LIGHTS_CULLING_TILE_SIZE
        php, ppw = round_up(h, t), round_up(w, t)
        color = targets["Main"]
        for t_k in reversed(layers):
            if t_attrs is not None:
                gb, _uv, mat_id, extras = interpolate.resolve_gbuffer_stream(
                    raster_t.stream_bins, t_k, inv_vp, cam, materials=mats,
                    width=w, height=h, tiles_y=tiles_y, tiles_x=tiles_x,
                    full_height=ctx.full_height, row0=ctx.row0,
                    return_extras=True,
                )
            else:
                gb, _uv, mat_id = interpolate.resolve_gbuffer(
                    geo, tri, t_k, inv_vp, cam, materials=mats,
                    full_height=ctx.full_height, row0=ctx.row0,
                )
            gb_p = gb
            if (php, ppw) != (h, w):
                def pad2(x):
                    padw = [(0, php - h), (0, ppw - w)] + [(0, 0)] * (x.ndim - 2)
                    return jnp.pad(x, padw)
                gb_p = jax.tree.map(pad2, gb)
            hdr = pbr.shade_forward_plus(
                gb_p, scene.lights, targets["LightIndices"], cam,
            )[:h, :w]
            opac = (extras["opacity"] if t_attrs is not None
                    else mats.opacity[mat_id])
            a = (gb.albedo[..., 3] * opac * gb.coverage)[..., None]
            color = color * (1.0 - a) + hdr * a
        targets["Main"] = color
        return targets


@node("Bloom")
class BloomNode(BaseNode):
    def process(self, ctx, targets):
        kw = dict(
            threshold=float(ctx.value("Bloom.Threshold", 1.0)),
            knee=float(ctx.value("Bloom.Knee", 0.5)),
            intensity=float(ctx.value("Bloom.Intensity", 0.35)),
        )
        dirt_i = float(ctx.value("Bloom.DirtIntensity", 0.0))
        if dirt_i > 0.0:
            kw["dirt"] = bloom_k.lens_dirt(ctx.fh, ctx.width)
            kw["dirt_intensity"] = dirt_i
        if ctx.sharded:
            # bloom's mip chain spans the whole frame: all_gather the HDR
            # rows (replicated compute — the frame is small next to ICI
            # bandwidth) and slice the local rows back out.
            full = jax.lax.all_gather(
                targets["Main"], ctx.mesh_axis, axis=0, tiled=True
            )
            bloomed = full + bloom_k.bloom(full, **kw)
            targets["Main"] = jax.lax.dynamic_slice(
                bloomed, (ctx.row0, 0, 0),
                (ctx.height, bloomed.shape[1], bloomed.shape[2]),
            )
        else:
            targets["Main"] = targets["Main"] + bloom_k.bloom(
                targets["Main"], **kw
            )
        return targets


@node("EyeAdaptation")
class EyeAdaptationNode(BaseNode):
    """Histogram exposure + temporal adaptation + tonemap
    (EyeAdaptationNode.cpp + Tonemapping.shader)."""

    def process(self, ctx, targets):
        hdr = targets["Main"]
        h, w = hdr.shape[:2]
        # exposure statistics from a quarter-res average: 16x less
        # histogram work, visually identical adaptation
        q = 4
        he, we = (h // q) * q, (w // q) * q
        hdr_q = jax.lax.reduce_window(
            hdr[:he, :we], 0.0, jax.lax.add, (q, q, 1), (q, q, 1), "VALID"
        ) * (1.0 / (q * q))
        hist = hist_k.luminance_histogram(hdr_q)
        if ctx.sharded:
            # exposure is a GLOBAL statistic: sum the per-slice histograms
            # over ICI (the reference's single compute dispatch becomes one
            # psum — RHIFrameGraph barrier machinery has no analog here)
            hist = jax.lax.psum(hist, ctx.mesh_axis)
        prev = (ctx.state or {}).get("avg_luminance", jnp.asarray(0.18))
        avg = hist_k.adapt_average_luminance(
            hist, prev, float((w // q) * (ctx.fh // q)),
            ctx.scene.frame.delta_time + 0.25,
            tau=float(ctx.value("EyeAdaptation.Tau", 1.1)),
        )
        mode = str(ctx.config.get("tonemap", "aces"))
        ldr = tm.tonemap(hdr, avg, mode=mode)
        srgb = m3.linear_to_srgb(ldr)
        if ctx.config.get("ldr_dither", True):
            # g_ditherPatternSampler analog (DefaultRenderer.renderer:9):
            # +-0.5/255 blue-noise on the sRGB output breaks 8-bit banding
            # in sky/light gradients. The 64x64 void-and-cluster mask is
            # tiled arithmetically — zero gathers (row phase offsets the
            # tile so the repeat is non-obvious).
            from sailor_tpu.raytracing.bluenoise import blue_noise_mask

            bn = jnp.asarray(blue_noise_mask(64), jnp.float32)  # [0,1)
            reps_y = -(-h // 64) + 1
            reps_x = -(-w // 64)
            tiled = jnp.tile(bn, (reps_y, reps_x))
            r0 = jnp.asarray(ctx.row0, jnp.int32) % 64
            tiled = jax.lax.dynamic_slice(tiled, (r0, 0), (h, w))
            srgb = srgb + (tiled[..., None] - 0.5) * (1.0 / 255.0)
        targets["Final"] = jnp.clip(srgb, 0.0, 1.0)
        targets.setdefault("state_out", {})["avg_luminance"] = avg
        return targets


@node("Blit")
class BlitNode(BaseNode):
    def process(self, ctx, targets):
        src = targets[self.p("src", "Sky")]
        dst_name = self.p("dst", "Main")
        if dst_name in targets:
            dst_hw = targets[dst_name].shape[:2]
        else:
            dst_hw = (ctx.height, ctx.width)
        targets[dst_name] = sampling.blit(src, dst_hw)
        return targets


@node("DepthHighZ")
class DepthHighZNode(BaseNode):
    """HiZ min-pyramid (ComputeDepthHighZ.shader) for occlusion queries.

    With ``hiz_culling`` on, the culling levels (texel sizes 4..128 px)
    ride through temporal state so next frame's DepthPrepass can occlusion-
    cull triangles against them (ComputeMeshCulling.shader consumer).
    The chain must reach coarse texels: a triangle only gets TESTED at a
    level where its footprint spans <= 2 texels, so a 4/8/16-px-only chain
    silently skipped every triangle bigger than ~32 px — the common case
    for near occludees (measured 39%% cull rate on a wall scene whose
    hidden set is ~100%%; 8 levels reach ~97%%).
    """

    def process(self, ctx, targets):
        levels = int(self.p("levels", 8))
        mips = sampling.build_min_pyramid(targets["Depth"], levels)
        for i, m in enumerate(mips[1:5], 1):
            targets[f"HiZ/mip{i}"] = m
        if ctx.config.get("hiz_culling", True):
            out = targets.setdefault("state_out", {})
            for i, m in enumerate(mips[2:]):
                out[f"hiz/mip{i}"] = m
        return targets


@node("DebugDraw")
class DebugDrawNode(BaseNode):
    """Overlay debug lines (DebugDrawNode.cpp). Lines come from the
    engine's DebugContext via config; no-op when empty."""

    def process(self, ctx, targets):
        dbg = ctx.config.get("debug_context")
        if dbg is None or not dbg.has_lines:
            return targets
        targets["Main"] = dbg.rasterize_over(
            targets["Main"], ctx.scene.frame.view_projection
        )
        return targets


@node("RenderOverlay")
class RenderOverlayNode(BaseNode):
    """Composite the host-built HUD canvas over Final
    (RenderImGuiNode.cpp + ImGuiUI.shader analog).

    The canvas is a fixed-shape (h, w, 4) straight-alpha array prepared by
    engine/overlay.OverlayContext and passed through temporal state as
    "overlay/canvas"; absent -> no-op. Position params: x, y (pixels)."""

    def process(self, ctx, targets):
        state = ctx.state or {}
        canvas = state.get("overlay/canvas")
        if canvas is None or "Final" not in targets:
            return targets
        final = targets["Final"]
        h, w = final.shape[:2]
        ch, cw = canvas.shape[:2]
        ch, cw = min(ch, h), min(cw, w)
        x0 = int(self.p("x", 0))
        y0 = int(self.p("y", 0))
        patch = final[y0 : y0 + ch, x0 : x0 + cw]
        rgb = canvas[:ch, :cw, :3]
        a = canvas[:ch, :cw, 3:4]
        blended = patch * (1.0 - a) + rgb * a
        targets["Final"] = jax.lax.dynamic_update_slice(
            final, blended, (y0, x0, 0)
        )
        return targets


@node("CopyTextureToRam")
class CopyTextureToRamNode(BaseNode):
    """GPU -> host readback marker (CopyTextureToRamNode.cpp, used for
    editor thumbnails). Under jit nothing happens; after process() returns,
    call ``fetch(targets)`` to pull the chosen target to numpy."""

    def process(self, ctx, targets):
        targets.setdefault("readback", []).append(self.p("target", "Final"))
        return targets

    @staticmethod
    def fetch(targets):
        import numpy as np

        return {
            name: np.asarray(targets[name])
            for name in targets.get("readback", [])
            if name in targets
        }


@node("Particles")
class ParticlesNode(BaseNode):
    """GPU particle playback (experimental ParticlesNode.cpp analog).

    Two sources, matching the reference's two paths:
    - baked animation: node param ``asset: path.particles`` loads the
      ParticleInfo YAML + ParticleData binary once (in prepare, host
      side); playback interpolates the frame records on device
      (assets/particles.sample_baked).
    - live sim: ``particles/pos|vel|life`` arrays in the temporal state
      dict integrate Euler + gravity per frame.

    Rendering is the scatter-free tile-binned soft splat
    (kernels/particles.splat_particles) with a reverse-Z soft depth test,
    plus the reference's trace-decay motion trail: an exponentially
    decayed splat accumulator carried in the state dict.
    """

    def prepare(self, ctx):
        path = self.p("asset")
        if path and getattr(self, "_asset_path", None) != path:
            from sailor_tpu.assets.particles import ParticlesAsset

            self._asset = ParticlesAsset.load(path)
            self._asset_path = path
            self._baked = jnp.asarray(self._asset.data)

    def process(self, ctx, targets):
        from sailor_tpu.assets.particles import sample_baked
        from sailor_tpu.kernels import particles as part_k

        state = ctx.state or {}
        out = targets.setdefault("state_out", {})
        asset = getattr(self, "_asset", None)

        if asset is not None:
            pos, radii, colors = sample_baked(
                self._baked, ctx.scene.frame.current_time,
                asset.fps, asset.frames,
            )
            trace_decay = asset.trace_decay
        elif "particles/pos" in state:
            pos = state["particles/pos"]
            vel = state["particles/vel"]
            life = state["particles/life"]
            dt = ctx.scene.frame.delta_time
            gravity = jnp.asarray([0.0, float(self.p("gravity", -2.0)), 0.0])
            vel = vel + gravity * dt
            pos = pos + vel * dt
            life = life - dt
            out["particles/pos"] = pos
            out["particles/vel"] = vel
            out["particles/life"] = life
            base = jnp.asarray(self.p("color", [4.0, 2.5, 1.0]) + [1.0])
            colors = jnp.where(
                (life > 0.0)[:, None], base[None, :], 0.0
            )
            radii = jnp.full(pos.shape[:1], float(self.p("size", 0.08)))
            trace_decay = float(self.p("traceDecay", 0.0))
        else:
            return targets

        main = targets.get("Main")
        if main is None:
            return targets
        splat = part_k.splat_particles(
            pos, radii, colors,
            ctx.scene.frame.view_projection, ctx.scene.frame.projection,
            targets["Depth"],
            width=ctx.width, height=ctx.height,
            full_height=ctx.full_height, row0=ctx.row0,
            capacity=int(self.p("capacity", 64)),
        )
        if trace_decay > 0.0:
            # motion trail (PushConstants m_traceDecay/m_traceFrames): an
            # exponentially decayed splat history in the temporal state
            trail = state.get("particles/trail")
            if (
                trail is not None and ctx.sharded
                and trail.shape[0] != splat.shape[0]
            ):
                # state trail is full-height (gathered); take the local rows
                trail = jax.lax.dynamic_slice_in_dim(
                    trail, ctx.row0, splat.shape[0], 0
                )
            if trail is None or trail.shape != splat.shape:
                trail = jnp.zeros_like(splat)
            trail = trail * trace_decay + splat
            out["particles/trail"] = trail
            splat = trail
        targets["Main"] = main + splat
        return targets
