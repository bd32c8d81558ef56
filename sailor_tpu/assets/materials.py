"""Material system — counterpart of Runtime/AssetRegistry/Material/
MaterialImporter.cpp (.mat YAML: render state, shader, samplers, uniforms)
and the bindless texture-samplers set used by Standard.shader.

Device side: a MaterialTable pytree of per-material parameters + one
texture *stack* (N, S, S, 4) — the TPU analog of the bindless descriptor
array (all textures resized to one resolution so a per-pixel layer index
turns sampling into a dense gather).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import struct


QUEUE_OPAQUE = 0
QUEUE_MASKED = 1
QUEUE_TRANSPARENT = 2

_QUEUE_NAMES = {"Opaque": 0, "Masked": 1, "Transparent": 2}


@struct.dataclass
class MaterialTable:
    albedo: jnp.ndarray          # (M, 3)
    metallic: jnp.ndarray        # (M,)
    roughness: jnp.ndarray       # (M,)
    emissive: jnp.ndarray        # (M, 3)
    albedo_texture: jnp.ndarray  # (M,) int32 layer or -1
    normal_texture: jnp.ndarray  # (M,) int32 layer or -1 (tangent-space map)
    textures: jnp.ndarray        # (N, S, S, 4) stacked linear RGBA (mip 0)
    # Render state (Types.h:524-580 RenderState / .mat renderQueue):
    queue: jnp.ndarray           # (M,) int32 0=Opaque 1=Masked 2=Transparent
    alpha_cutoff: jnp.ndarray    # (M,) float alpha-test threshold (Masked)
    opacity: jnp.ndarray         # (M,) float base opacity (Transparent)
    # Static (host) summary so the graph can skip whole passes at trace
    # time — the analog of the reference's tag-filtered proxy lists
    # (RenderSceneNode.cpp:34-104 returning early on empty batches).
    has_masked: bool = struct.field(pytree_node=False, default=False)
    has_transparent: bool = struct.field(pytree_node=False, default=False)
    # Runtime mip/LOD sampling + per-texture sampler meta, the consumer
    # side of TextureImporter.cpp:247's import-time mip chains and
    # TextureAssetInfo.cpp:24-49's clamping/filtration settings. The mip
    # pyramid is ONE flat (N * texels_per_layer, 4) buffer; every texture
    # shares the (power-of-two) level size list, so addressing needs only
    # the static ``mip_sizes``/offset arithmetic.
    tex_lod: jnp.ndarray | None = None    # (N * TPL, 4) packed mips 0..L-1
    tex_wrap: jnp.ndarray | None = None   # (N,) int32 0=repeat 1=clamp
    tex_filter: jnp.ndarray | None = None  # (N,) int32 0=bilinear 1=nearest
    mip_sizes: tuple = struct.field(pytree_node=False, default=())
    # Combined per-material quad rows: row (group, level, y, x) packs the
    # full 2x2 bilinear footprint of EVERY map the material samples
    # (albedo RGBA quad = 16 floats [+ tangent-space normal RGB quad = 12]),
    # neighbors wrap-folded at build time. One trilinear material fetch is
    # then TWO row gathers instead of 16 — the per-pixel gather op (~13 ms
    # per (H*W)-row gather at 1080p on v5e, row width free) is the entire
    # texture cost, so packing taps into rows is the TPU-native sampler.
    tex_quad: jnp.ndarray | None = None    # (G * TPL, 16|28) f32
    quad_group: jnp.ndarray | None = None  # (M,) int32 material -> group
    quad_wrap: jnp.ndarray | None = None   # (G,) int32 0=repeat 1=clamp
    quad_filter: jnp.ndarray | None = None  # (G,) int32 0=bilinear 1=nearest
    quad_has_normal: bool = struct.field(pytree_node=False, default=False)
    # ((kind, (offset, nch)), ...) for the blocks actually packed in
    # tex_quad — build_quad_stack_blocks DROPS all-absent blocks, so the
    # sampler must use the built layout, not assume albedo-first.
    quad_offsets: tuple = struct.field(pytree_node=False, default=())
    # per-block sRGB flags when tex_quad is u8-quantized (empty = f32 rows)
    quad_srgb: tuple = struct.field(pytree_node=False, default=())
    # narrow (Gm*TPL, 4) albedo-alpha quad for the masked peel loop —
    # masked-queue groups only; alpha_group remaps material -> block
    tex_quad_alpha: jnp.ndarray | None = None
    alpha_group: jnp.ndarray | None = None
    # split-out mip-0 rows (tex_quad then holds levels 1..; see
    # build_quad_stack split_mip0)
    tex_quad_mip0: jnp.ndarray | None = None

    @property
    def has_mips(self) -> bool:
        return self.tex_lod is not None and len(self.mip_sizes) > 1

    @property
    def has_quad(self) -> bool:
        return self.tex_quad is not None and len(self.mip_sizes) > 1

    def sample_combined(self, mat_id, uv, lod):
        """One-call material fetch from the combined quad stack: returns
        (albedo RGBA, tangent-space normal in [-1,1] or None, has_normal
        mask). Two row gathers total (trilinear), all maps included."""
        g = self.quad_group[mat_id]
        # legacy tables (pre-quad_offsets) packed albedo-first with the
        # normal quad at float 16 when present — deriving the fallback
        # from quad_has_normal keeps their normal mapping intact
        offsets = self.quad_offsets or (
            (("albedo", (0, 4)), ("normal", (16, 3)))
            if self.quad_has_normal else (("albedo", (0, 4)),)
        )
        out = sample_quad_blocks(
            self.tex_quad, self.mip_sizes,
            tuple(o for _, o in offsets), g, uv, lod,
            wrapc=self.quad_wrap[g] == 1,
            nearest=self.quad_filter[g] == 1,
            srgb=self.quad_srgb,
            flat0=self.tex_quad_mip0,
        )
        bmap = dict(zip((k for k, _ in offsets), out))
        albedo = bmap.get("albedo")
        if albedo is None:   # normal-map-only stack: albedo block dropped
            albedo = jnp.ones(uv.shape[:-1] + (4,))
        if "normal" in bmap:
            return (albedo, bmap["normal"] * 2.0 - 1.0,
                    self.normal_texture[mat_id] >= 0)
        return albedo, None, jnp.zeros(mat_id.shape, bool)

    def sample_alpha(self, mat_id, uv, lod):
        """Albedo-texture ALPHA only, from the narrow alpha-quad table —
        the masked depth-peel's per-layer alpha test (ONE nearest-mip
        gather of a 4-wide u8 row; the combined table's wide rows cost
        ~7x more per gather on large material sets, and the hard cutoff
        makes mip-lerp moot). Falls back to sample_combined."""
        if self.tex_quad_alpha is None:
            tex, _, _ = self.sample_combined(mat_id, uv, lod)
            return tex[..., 3]
        g = self.quad_group[mat_id]
        ga = (self.alpha_group[mat_id] if self.alpha_group is not None
              else g)
        out = sample_quad_blocks(
            self.tex_quad_alpha, self.mip_sizes, ((0, 1),), ga, uv, lod,
            wrapc=self.quad_wrap[g] == 1,
            nearest=self.quad_filter[g] == 1,
            srgb=self.quad_srgb[:1],
            trilinear=False,
        )
        return out[0][..., 0]

    def sample_normal(self, mat_id, uv, lod=None):
        """Tangent-space normal from the material's normal map; returns
        ((..., 3) normal in [-1,1], (...,) has_map mask)."""
        layer = self.normal_texture[mat_id]
        if self.textures.shape[0] == 0:
            z = jnp.zeros(mat_id.shape + (3,))
            return z.at[..., 2].set(1.0), jnp.zeros(mat_id.shape, bool)
        tex = self.sample_texture(layer, uv, lod)
        n = tex[..., :3] * 2.0 - 1.0
        return n, layer >= 0

    def sample_texture(self, layer, uv, lod=None):
        """Sample the texture stack: trilinear mip when a mip stack and a
        per-pixel ``lod`` are available, bilinear mip0 otherwise."""
        if lod is not None and self.has_mips:
            return sample_texture_lod(
                self.tex_lod, self.textures.shape[0], self.mip_sizes,
                layer, uv, lod, wrap=self.tex_wrap, filt=self.tex_filter,
            )
        return _sample_texture_stack(self.textures, layer, uv,
                                     wrap=self.tex_wrap,
                                     filt=self.tex_filter)

    def sample(self, mat_id, uv, lod=None):
        """Per-pixel material fetch (mat_id (H, W), uv (H, W, 2)).

        Returns (albedo_rgba, metallic, roughness, emissive)."""
        alb = self.albedo[mat_id]                       # (H, W, 3)
        met = self.metallic[mat_id]
        rough = self.roughness[mat_id]
        emis = self.emissive[mat_id]
        if self.has_quad and lod is not None:
            tex, _, _ = self.sample_combined(mat_id, uv, lod)
            alb = alb * tex[..., :3]
            alpha = tex[..., 3]
        elif self.textures.shape[0] > 0:
            layer = self.albedo_texture[mat_id]         # (H, W)
            tex = self.sample_texture(layer, uv, lod)
            alb = alb * jnp.where((layer >= 0)[..., None], tex[..., :3], 1.0)
            alpha = jnp.where(layer >= 0, tex[..., 3], 1.0)
        else:
            alpha = jnp.ones_like(met)
        return (
            jnp.concatenate([alb, alpha[..., None]], axis=-1),
            met, rough, emis,
        )

    @classmethod
    def from_host(cls, table: dict, images: list | None = None,
                  texture_size: int = 256, sampler_meta: list | None = None,
                  mips: bool = True) -> "MaterialTable":
        textures = stack_textures(images or [], texture_size)
        m = len(table["albedo"])
        queues = table.get("queue", np.zeros(m, np.int32))
        queues = np.asarray(
            [_QUEUE_NAMES.get(q, q) if isinstance(q, str) else q for q in queues],
            np.int32,
        )
        n_tex = textures.shape[0]
        tex_lod = mip_sizes = None
        if mips and n_tex:
            tex_lod, mip_sizes = build_mip_stack(np.asarray(textures))
        wrap = np.zeros(n_tex, np.int32)
        filt = np.zeros(n_tex, np.int32)
        for i, meta in enumerate(sampler_meta or []):
            if i >= n_tex or not meta:
                continue
            wrap[i] = 1 if str(meta.get("clamping", "Repeat")).lower() == "clamp" else 0
            filt[i] = 1 if str(meta.get("filtration", "Bilinear")).lower() == "nearest" else 0
        tex_quad = quad_group = quad_wrap = quad_filter = None
        quad_has_normal = False
        quad_offsets = ()
        quad_srgb = ()
        tex_quad_alpha = alpha_group = tex_quad_mip0 = None
        a_tex = np.asarray(table.get("albedo_texture", np.full(m, -1, np.int32)))
        n_tx = np.asarray(table.get("normal_texture", np.full(m, -1, np.int32)))
        if mips and n_tex:
            import os as _os

            (tex_quad, tex_quad_mip0, quad_group, quad_wrap, quad_filter,
             quad_has_normal, quad_offsets, quad_srgb, tex_quad_alpha,
             alpha_group, _qs) = build_quad_stack(
                np.asarray(textures), a_tex, n_tx, wrap, filt,
                quantize=_os.environ.get("SAILOR_QUAD_U8", "1") == "1",
                # split default OFF: with i32-packed lanes the extra mip0
                # gather costs more than the smaller tables save (traced)
                masked=queues == QUEUE_MASKED,
                split_mip0=_os.environ.get("SAILOR_QUAD_SPLIT", "0") == "1")
        return cls(
            tex_quad=tex_quad,
            quad_group=quad_group,
            quad_wrap=quad_wrap,
            quad_filter=quad_filter,
            quad_has_normal=quad_has_normal,
            quad_offsets=quad_offsets,
            quad_srgb=quad_srgb,
            tex_quad_alpha=tex_quad_alpha,
            alpha_group=alpha_group,
            tex_quad_mip0=tex_quad_mip0,
            tex_lod=tex_lod,
            tex_wrap=jnp.asarray(wrap) if n_tex else None,
            tex_filter=jnp.asarray(filt) if n_tex else None,
            mip_sizes=tuple(mip_sizes or ()),
            albedo=jnp.asarray(table["albedo"]),
            metallic=jnp.asarray(table["metallic"]),
            roughness=jnp.asarray(table["roughness"]),
            emissive=jnp.asarray(table["emissive"]),
            albedo_texture=jnp.asarray(
                table.get("albedo_texture", np.full(m, -1, np.int32))
            ),
            normal_texture=jnp.asarray(
                table.get("normal_texture", np.full(m, -1, np.int32))
            ),
            textures=textures,
            queue=jnp.asarray(queues),
            alpha_cutoff=jnp.asarray(
                table.get("alpha_cutoff", np.full(m, 0.5, np.float32))
            ),
            opacity=jnp.asarray(table.get("opacity", np.ones(m, np.float32))),
            has_masked=bool((queues == QUEUE_MASKED).any()),
            has_transparent=bool((queues == QUEUE_TRANSPARENT).any()),
        )


def stack_textures(images: list, size: int) -> jnp.ndarray:
    """Resize decoded images to one (size, size) and stack (bindless-array
    analog). Empty list -> (0, size, size, 4)."""
    if not images:
        return jnp.zeros((0, size, size, 4))
    out = []
    for img in images:
        h, w = img.shape[:2]
        ys = (np.arange(size) + 0.5) * h / size
        xs = (np.arange(size) + 0.5) * w / size
        yi = np.clip(ys.astype(int), 0, h - 1)
        xi = np.clip(xs.astype(int), 0, w - 1)
        out.append(img[yi][:, xi])
    return jnp.asarray(np.stack(out), jnp.float32)


def _sample_texture_stack(stack, layer, uv, wrap=None, filt=None):
    """Bilinear sample from (N, S, S, 4) with per-pixel layer index.

    ``wrap``/``filt``: optional (N,) int32 sampler meta — 1 = clamp-to-edge
    instead of repeat / nearest instead of bilinear (TextureAssetInfo.cpp
    clamping/filtration consumed at runtime)."""
    n, s = stack.shape[0], stack.shape[1]
    safe = jnp.clip(layer, 0, n - 1)
    fx = uv[..., 0] * s - 0.5
    fy = uv[..., 1] * s - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    if filt is not None:
        # nearest = bilinear with weights snapped (no extra gathers)
        nearest = (filt[safe] == 1)[..., None]
        tx = jnp.where(nearest, jnp.round(tx), tx)
        ty = jnp.where(nearest, jnp.round(ty), ty)
    clamp_m = None if wrap is None else (wrap[safe] == 1)

    def addr(i):
        rep = jnp.remainder(i, s)
        if clamp_m is None:
            return rep
        return jnp.where(clamp_m, jnp.clip(i, 0, s - 1), rep)

    flat = stack.reshape(-1, stack.shape[-1])

    def fetch(yy, xx):
        # flat 1-D gather (multi-index gathers hit a slow TPU path)
        return flat[(safe * s + addr(yy)) * s + addr(xx)]

    c00 = fetch(y0, x0)
    c10 = fetch(y0, x0 + 1)
    c01 = fetch(y0 + 1, x0)
    c11 = fetch(y0 + 1, x0 + 1)
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty


MIN_MIP = 4  # coarsest mip edge; 4x4 bounds the level count and keeps
             # the wrap arithmetic off the degenerate 1-texel case


def build_mip_stack(stack: np.ndarray):
    """Pack a box-filtered mip pyramid of every layer into ONE flat
    (N * TPL, 4) buffer (TextureImporter.cpp:247's import-time chain).

    Level l of layer i lives at rows [i * TPL + off_l, ...), row-major
    s_l x s_l; all layers share the power-of-two size list, so offsets
    are static. Returns (flat jnp array, sizes tuple)."""
    n, s = stack.shape[0], stack.shape[1]
    sizes = []
    cur = s
    while cur >= MIN_MIP:
        sizes.append(cur)
        if cur == MIN_MIP:
            break
        cur //= 2
    per_layer = []
    for i in range(n):
        img = stack[i]
        rows = [img.reshape(-1, img.shape[-1])]
        cur = img
        for _ in sizes[1:]:
            h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
            cur = cur.reshape(h2, 2, w2, 2, -1).mean(axis=(1, 3))
            rows.append(cur.reshape(-1, cur.shape[-1]))
        per_layer.append(np.concatenate(rows, axis=0))
    flat = np.concatenate(per_layer, axis=0).astype(np.float32)
    return jnp.asarray(flat), tuple(sizes)


def _mip_chain(img: np.ndarray, sizes) -> list:
    """Box-filtered pyramid of one (S, S, C) image for the shared size
    list (TextureImporter.cpp:247's import-time chain)."""
    out = [img]
    cur = img
    for _ in sizes[1:]:
        h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
        cur = cur.reshape(h2, 2, w2, 2, -1).mean(axis=(1, 3))
        out.append(cur)
    return out


def _quad_fold(img: np.ndarray, clamp: bool) -> np.ndarray:
    """(S, S, C) -> (S*S, 4C) rows [c00|c10|c01|c11] with the +1 neighbor
    folded by the texture's wrap mode."""
    if clamp:
        s = img.shape[0]
        nx = np.minimum(np.arange(s) + 1, s - 1)
        right = img[:, nx]
        down = img[nx]
        diag = img[nx][:, nx]
    else:
        right = np.roll(img, -1, axis=1)
        down = np.roll(img, -1, axis=0)
        diag = np.roll(right, -1, axis=0)
    q = np.concatenate([img, right, down, diag], axis=-1)
    return q.reshape(-1, q.shape[-1])


def build_quad_stack_blocks(textures: np.ndarray, blocks: list,
                            wrap: np.ndarray, filt: np.ndarray,
                            quantize: tuple | None = None):
    """Combined per-material quad mip stack over arbitrary channel blocks.

    ``textures``: (N, S, S, 4) linear mip-0 layers. ``blocks``: list of
    (layers (M,) int, nch, neutral tuple) — one entry per map kind the
    consumer samples (albedo, normal, ORM, emissive...); a block whose
    layers are all -1 is dropped. Materials dedupe to unique layer-tuple
    groups; each group's rows pack the 2x2 bilinear footprint of every
    included block at every (level, texel), neighbors folded by the wrap
    mode, missing maps filled with their neutral so the sampler needs no
    per-map masking. Returns (rows f32, group (M,), gwrap, gfilt,
    block_offsets tuple of (off, nch), sizes).

    ``quantize``: optional per-block sRGB flags (True = encode with the
    2.2 transfer before rounding) — rows are stored UINT8. Sources are
    8-bit images, so u8 + the sRGB transfer loses nothing vs the files;
    what changes is filtering order (weights apply to encoded values,
    decoded after the lerp — classic pre-sRGB-hardware filtering). The
    point is the per-pixel gather: row tables beyond ~100 MB gather at
    ~3 GB/s on v5e (measured, tools/diag_gather.py) — Sponza's 25-group
    245 MB f32 table cost 93-120 ms PER (H*W)-row gather, 8 of which were
    ~880 ms of the 977 ms frame; u8 shrinks it 4x (~20 ms/gather)."""
    s = textures.shape[1]
    sizes = []
    cur = s
    while cur >= MIN_MIP:
        sizes.append(cur)
        if cur == MIN_MIP:
            break
        cur //= 2

    live = [(np.asarray(ls, np.int64), nch, neutral)
            for (ls, nch, neutral) in blocks
            if bool((np.asarray(ls) >= 0).any())]
    if not live:
        live = [(np.asarray(blocks[0][0], np.int64),) + blocks[0][1:]]
    m = len(live[0][0])

    keys = {}
    group = np.zeros(m, np.int32)
    for mi in range(m):
        k = tuple(int(ls[mi]) for ls, _, _ in live)
        if k not in keys:
            keys[k] = len(keys)
        group[mi] = keys[k]

    chains = {}

    def chain(i):
        if i not in chains:
            chains[i] = _mip_chain(np.asarray(textures[i], np.float32), sizes)
        return chains[i]

    neutrals = [
        [np.broadcast_to(np.asarray(neutral, np.float32),
                         (sz, sz, nch)).copy() for sz in sizes]
        for _, nch, neutral in live
    ]

    gwrap = np.zeros(len(keys), np.int32)
    gfilt = np.zeros(len(keys), np.int32)
    rows = []
    offsets = []
    off = 0
    for _, nch, _ in live:
        offsets.append((off, nch))
        off += 4 * nch
    for key, gi in sorted(keys.items(), key=lambda kv: kv[1]):
        # the shared row address uses the first present map's wrap (maps
        # of one material with DIFFERENT wraps fold with that one — such
        # pairs virtually never mismatch; the per-layer path remains)
        src = next((l for l in key if l >= 0), -1)
        w = int(wrap[src]) if src >= 0 else 0
        gwrap[gi] = w
        gfilt[gi] = int(filt[src]) if src >= 0 else 0
        for li, sz in enumerate(sizes):
            parts = []
            for bi, (l, (_, nch, _)) in enumerate(zip(key, live)):
                img = (chain(l)[li][..., :nch] if l >= 0
                       else neutrals[bi][li])
                parts.append(_quad_fold(img, clamp=w == 1))
            rows.append(np.concatenate(parts, axis=-1)
                        if len(parts) > 1 else parts[0])
    flat = np.concatenate(rows, axis=0).astype(np.float32)
    if quantize is not None:
        enc = np.empty_like(flat)
        for bi, (off, nch) in enumerate(offsets):
            blk = np.clip(flat[:, off:off + 4 * nch], 0.0, 1.0)
            if bi < len(quantize) and quantize[bi]:
                blk = blk ** (1.0 / 2.2)
            enc[:, off:off + 4 * nch] = blk
        flat = pack_u8_rows(np.round(enc * 255.0).astype(np.uint8))
    return (jnp.asarray(flat), jnp.asarray(group), jnp.asarray(gwrap),
            jnp.asarray(gfilt), tuple(offsets), tuple(sizes))


def pack_u8_rows(rows_u8: np.ndarray) -> np.ndarray:
    """(R, C) u8 -> (R, ceil(C/4)) int32, 4 bytes per lane little-endian.

    Per-pixel row gathers on v5e cost ~lanes x rows regardless of byte
    width (measured: a (2M,)-row gather of 4-lane u8 rows is ~3x faster
    than 28-lane u8 rows from the SAME table) — packing quarters the
    lane count; unpack is elementwise shift/mask that fuses away."""
    r, c = rows_u8.shape
    cpad = -(-c // 4) * 4
    if cpad != c:
        rows_u8 = np.concatenate(
            [rows_u8, np.zeros((r, cpad - c), np.uint8)], axis=1)
    packed = np.ascontiguousarray(rows_u8).view(np.int32)  # (R, cpad/4)
    return packed


def sample_quad_blocks(flat, mip_sizes: tuple, block_offsets: tuple,
                       group, uv, lod, wrapc, nearest, srgb: tuple = (),
                       flat0=None, trilinear: bool = True):
    """Trilinear fetch of EVERY channel block with 2-3 row gathers.

    ``flat``: (G * TPL, C) combined rows from build_quad_stack_blocks
    (f32, or u8 when built with ``quantize`` — decoded before the lerp,
    per-block 2.2 transfer from ``srgb``); ``group``: (...,) int32
    per-sample group; ``wrapc``/``nearest``: (...,) bool per-sample
    sampler state. Returns a list of (..., nch) arrays, one per block,
    in build order.

    ``flat0``: optional split-out mip-0 table (build_quad_stack
    split_mip0) — ``flat`` then holds levels 1.. only. Mip 0 is 3/4 of
    the rows but only lod<1 taps touch it, so the two trilinear taps hit
    the 4x-smaller table and one extra (cheaper-per-row) gather serves
    level 0; large material sets gather ~3x faster total."""
    quantized = flat.dtype in (jnp.uint8, jnp.int32)
    packed = flat.dtype == jnp.int32
    nbytes = sum(4 * nch for _, nch in block_offsets)
    sizes = mip_sizes
    nlev = len(sizes)
    split = flat0 is not None
    lvl_sizes = sizes[1:] if split else sizes
    offs, acc = [], 0
    for s in lvl_sizes:
        offs.append(acc)
        acc += s * s
    base = group * acc
    base0 = group * (sizes[0] * sizes[0]) if split else None
    sizes_a = jnp.asarray(lvl_sizes, jnp.int32)
    offs_a = jnp.asarray(offs, jnp.int32)
    lod = jnp.clip(lod, 0.0, nlev - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    lf = (lod - l0)[..., None]
    nearest = nearest[..., None]

    def decode(q):
        if not quantized:
            return q
        if packed:
            # unpack 4 little-endian bytes per i32 lane (pack_u8_rows):
            # elementwise shift/mask, fuses into the weight math
            parts = [(jax.lax.shift_right_logical(q, jnp.int32(8 * k))
                      & 0xFF) for k in range(4)]
            q = jnp.stack(parts, axis=-1).reshape(
                q.shape[:-1] + (q.shape[-1] * 4,))[..., :nbytes]
        # decode BEFORE the filter (hardware-sampler semantics): u8 +
        # per-block sRGB transfer is lossless vs the 8-bit sources;
        # the pow is elementwise and fuses into the weight math
        q = q.astype(jnp.float32) * (1.0 / 255.0)
        if any(srgb):
            dec = [q[..., boff:boff + 4 * nch] ** 2.2
                   if bi < len(srgb) and srgb[bi]
                   else q[..., boff:boff + 4 * nch]
                   for bi, (boff, nch) in enumerate(block_offsets)]
            q = jnp.concatenate(dec, axis=-1)
        return q

    def taps_from(table, tbase, s, off):
        sf = s.astype(jnp.float32) if hasattr(s, "astype") else float(s)
        fx = uv[..., 0] * sf - 0.5
        fy = uv[..., 1] * sf - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        tx = (fx - x0)[..., None]
        ty = (fy - y0)[..., None]
        tx = jnp.where(nearest, jnp.round(tx), tx)
        ty = jnp.where(nearest, jnp.round(ty), ty)
        # clamp: snap the weight at the low edge (the quad at addr 0
        # would otherwise lerp toward texel 1); the high edge is folded
        # at build (the edge quad duplicates its own texel).
        tx = jnp.where((wrapc & (x0 < 0))[..., None], 0.0, tx)
        ty = jnp.where((wrapc & (y0 < 0))[..., None], 0.0, ty)
        xw = jnp.where(wrapc, jnp.clip(x0, 0, s - 1), jnp.remainder(x0, s))
        yw = jnp.where(wrapc, jnp.clip(y0, 0, s - 1), jnp.remainder(y0, s))
        q = decode(table[tbase + off + yw * s + xw])  # ONE row gather
        w00 = (1.0 - tx) * (1.0 - ty)
        w10 = tx * (1.0 - ty)
        w01 = (1.0 - tx) * ty
        w11 = tx * ty
        out = []
        for boff, nch in block_offsets:
            out.append(q[..., boff:boff + nch] * w00
                       + q[..., boff + nch:boff + 2 * nch] * w10
                       + q[..., boff + 2 * nch:boff + 3 * nch] * w01
                       + q[..., boff + 3 * nch:boff + 4 * nch] * w11)
        return out

    def taps(lvl):
        # lvl indexes the FULL level list; the split table starts at 1
        i = jnp.maximum(lvl - 1, 0) if split else lvl
        return taps_from(flat, base, sizes_a[i], offs_a[i])

    if not trilinear:
        # nearest-mip: ONE row gather per pixel (bilinear within the
        # level still applies — the row IS the 2x2 footprint). Used by
        # the depth-peel alpha test, where mip-lerp precision is moot
        # against a hard cutoff but the second gather costs ~4 ms/layer.
        ln = jnp.round(lod).astype(jnp.int32)
        if split:
            tnr = taps(jnp.maximum(ln, 1))
            tn0 = taps_from(flat0, base0, sizes[0], 0)
            is0 = (ln == 0)[..., None]
            return [jnp.where(is0, a0, ar) for a0, ar in zip(tn0, tnr)]
        return taps(ln)
    if split:
        t0r = taps(jnp.maximum(l0, 1))
        t00 = taps_from(flat0, base0, sizes[0], 0)
        is0 = (l0 == 0)[..., None]
        t0 = [jnp.where(is0, a0, ar) for a0, ar in zip(t00, t0r)]
    else:
        t0 = taps(l0)
    t1 = taps(jnp.minimum(l0 + 1, nlev - 1))
    return [a + (b - a) * lf for a, b in zip(t0, t1)]


def build_quad_stack(textures: np.ndarray, a_tex: np.ndarray,
                     n_tex: np.ndarray, wrap: np.ndarray, filt: np.ndarray,
                     quantize: bool = True, masked: np.ndarray | None = None,
                     split_mip0: bool = True):
    """Raster-path combined stack: albedo RGBA [+ normal RGB] blocks.
    Returns (rows, rows_mip0, group, gwrap, gfilt, has_normal, offsets,
    srgb, alpha_rows, alpha_group, sizes).

    ``quantize`` stores rows u8 (albedo sRGB-encoded, normal linear — see
    build_quad_stack_blocks). Two further gather-table shrinks (the
    per-pixel row gather runs at ~3 GB/s once a table outgrows ~50 MB,
    tools/diag_gather.py):

    - ``split_mip0``: mip 0 is 3/4 of every group's rows but only pixels
      with lod < 1 touch it — it moves to its own ``rows_mip0`` table and
      ``rows`` keeps levels 1.. (4x fewer rows), so the trilinear taps hit
      the small table and only one extra gather pays the mip0 price.
    - ``masked``: (M,) bool — the alpha-quad table for the depth-peel
      alpha test keeps only groups reachable from Masked-queue materials
      (``alpha_group`` remaps material -> alpha row block; identity when
      ``masked`` is None). Sponza: 25 groups -> 1, the peel's 6 gathers
      drop from 8.5 ms each to noise."""
    has_normal = bool((np.asarray(n_tex) >= 0).any())
    has_albedo = bool((np.asarray(a_tex) >= 0).any())
    blocks = [(a_tex, 4, (1.0, 1.0, 1.0, 1.0))]
    qflags = [True]  # albedo: sRGB transfer (matches textures.load's ^2.2)
    if has_normal:
        blocks.append((n_tex, 3, (0.5, 0.5, 1.0)))
        qflags.append(False)  # tangent-space vectors stay linear
    rows, group, gwrap, gfilt, offs, sizes = build_quad_stack_blocks(
        textures, blocks, wrap, filt,
        quantize=tuple(qflags) if quantize else None)
    # build_quad_stack_blocks drops all-absent blocks (falling back to the
    # first when none survive) — label the survivors so the sampler reads
    # the layout it actually got.
    kinds = [k for k, present in (("albedo", has_albedo),
                                  ("normal", has_normal)) if present]
    if not kinds:
        kinds = ["albedo"]
    offsets = tuple(zip(kinds, offs))
    srgb = tuple(k == "albedo" for k in kinds) if quantize else ()

    tpl = sum(s * s for s in sizes)
    ngroups = rows.shape[0] // tpl
    alpha_rows = alpha_group = None
    if kinds[0] == "albedo":
        a_off = offsets[0][1][0]
        r_np = np.asarray(rows)
        if r_np.dtype == np.int32:
            # packed rows: alpha = byte 3 of the albedo block's 4 lanes.
            # Keep the (R, 4) u8 row layout — re-packing as ONE i32 lane
            # was measured 4x SLOWER per gather (14.9 vs 3.7 ms at 2M
            # pixels on v5e): the 1-lane table lowers to a 1-D s32
            # gather, which misses the fast (sublane, lane)-tiled path.
            lanes = r_np[:, a_off // 4:a_off // 4 + 4].view(np.uint32)
            alpha_full = ((lanes >> 24) & 0xFF).astype(np.uint8)  # (R, 4)
        else:
            acols = [a_off + 3, a_off + 7, a_off + 11, a_off + 15]
            alpha_full = r_np[:, acols]
        g_np = np.asarray(group)
        if masked is not None:
            gm = np.unique(g_np[np.asarray(masked, bool)])
        else:
            gm = np.arange(ngroups)
        if gm.size:
            blocks3a = alpha_full.reshape(ngroups, tpl, -1)
            alpha_rows = jnp.asarray(
                blocks3a[gm].reshape(gm.size * tpl, -1))
            remap = np.zeros(ngroups, np.int32)
            remap[gm] = np.arange(gm.size, dtype=np.int32)
            alpha_group = jnp.asarray(remap[g_np])

    rows_mip0 = None
    if split_mip0 and len(sizes) > 1:
        s0sq = sizes[0] * sizes[0]
        blocks3 = rows.reshape(ngroups, tpl, rows.shape[1])
        rows_mip0 = blocks3[:, :s0sq].reshape(ngroups * s0sq, -1)
        rows = blocks3[:, s0sq:].reshape(ngroups * (tpl - s0sq), -1)

    return (rows, rows_mip0, group, gwrap, gfilt, has_normal, offsets,
            srgb, alpha_rows, alpha_group, sizes)


def sample_texture_lod(flat, n_layers: int, mip_sizes: tuple, layer, uv,
                       lod, wrap=None, filt=None):
    """Trilinear mip sample from the packed mip stack.

    ``lod`` (...): fractional mip level (0 = full res). Two bilinear
    fetches at floor/ceil level + lerp; at high minification the gathers
    land in a tiny mip whose rows stay cached, so this is FASTER than
    mip-0 bilinear despite 8 gathers vs 4 (HBM locality, not count, is
    the limit for repeated-texture scenes)."""
    sizes = mip_sizes
    nlev = len(sizes)
    offs = []
    acc = 0
    for s in sizes:
        offs.append(acc)
        acc += s * s
    tpl = acc
    n = n_layers
    safe = jnp.clip(layer, 0, n - 1)
    base = safe * tpl
    lod = jnp.clip(lod, 0.0, nlev - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    lf = (lod - l0)[..., None]
    sizes_a = jnp.asarray(sizes, jnp.int32)
    offs_a = jnp.asarray(offs, jnp.int32)
    clamp_m = None if wrap is None else (wrap[safe] == 1)
    nearest = None if filt is None else (filt[safe] == 1)[..., None]

    def bilinear(lvl):
        s = sizes_a[lvl]
        off = base + offs_a[lvl]
        sf = s.astype(jnp.float32)
        fx = uv[..., 0] * sf - 0.5
        fy = uv[..., 1] * sf - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        tx = (fx - x0)[..., None]
        ty = (fy - y0)[..., None]
        if nearest is not None:
            tx = jnp.where(nearest, jnp.round(tx), tx)
            ty = jnp.where(nearest, jnp.round(ty), ty)

        def addr(i):
            rep = jnp.remainder(i, s)
            if clamp_m is None:
                return rep
            return jnp.where(clamp_m, jnp.clip(i, 0, s - 1), rep)

        def fetch(yy, xx):
            return flat[off + addr(yy) * s + addr(xx)]

        c00 = fetch(y0, x0)
        c10 = fetch(y0, x0 + 1)
        c01 = fetch(y0 + 1, x0)
        c11 = fetch(y0 + 1, x0 + 1)
        top = c00 + (c10 - c00) * tx
        bot = c01 + (c11 - c01) * tx
        return top + (bot - top) * ty

    lo = bilinear(l0)
    hi = bilinear(jnp.minimum(l0 + 1, nlev - 1))
    return lo + (hi - lo) * lf


class MaterialLibrary:
    """Ordered set of .mat assets -> one device MaterialTable, rebuilt on
    hot reload — the consumer side of Material::OnHotReload
    (/root/reference/Runtime/AssetRegistry/Material/MaterialImporter.cpp:53):
    the reference's editor patches a material asset, the importer fires the
    hot-reload hook, and the RHI material rebuilds so the NEXT frame
    reflects the edit. Here the rebuilt artifact is the MaterialTable
    pytree; ``version`` bumps let renderers detect the swap.

    ``paths``: .mat file paths; list index == the material_id mesh
    renderers reference (MeshRendererComponent.material_id). Sampler keys
    ``baseSampler``/``albedoSampler`` -> albedo texture,
    ``normalSampler`` -> normal map, loaded through the same registry.
    """

    def __init__(self, registry, paths, texture_size: int = 64,
                 mips: bool = False):
        self.registry = registry
        self.paths = [str(p) for p in paths]
        self.texture_size = texture_size
        self.mips = mips
        self.version = 0
        self.table: MaterialTable | None = None
        registry.add_hot_reload_listener(self._on_hot_reload)
        self.rebuild()

    def _on_hot_reload(self, info) -> None:
        if info.path in self.paths:
            self.rebuild()

    def rebuild(self) -> None:
        import numpy as np

        assets = [self.registry.load(p) for p in self.paths]
        rows = [a.to_table_row() for a in assets]
        table = {k: [r[k] for r in rows] for k in rows[0]}
        images, tex_index = [], {}
        a_tex = np.full(len(assets), -1, np.int32)
        n_tex = np.full(len(assets), -1, np.int32)
        for i, a in enumerate(assets):
            for key, target in (("baseSampler", a_tex),
                                ("albedoSampler", a_tex),
                                ("normalSampler", n_tex)):
                rel = a.samplers.get(key)
                if not rel:
                    continue
                if rel not in tex_index:
                    tex_index[rel] = len(images)
                    images.append(np.asarray(self.registry.load(rel)))
                target[i] = tex_index[rel]
        table["albedo_texture"] = a_tex
        table["normal_texture"] = n_tex
        self.table = MaterialTable.from_host(
            table, images, texture_size=self.texture_size, mips=self.mips,
        )
        self.version += 1


# ---------------------------------------------------------------------------
# .mat YAML import (MaterialImporter parity)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MaterialAsset:
    """Parsed .mat file: render state + shader + uniforms
    (Content/Models/*/materials/*.mat schema)."""

    name: str = "material"
    render_queue: str = "Opaque"     # Opaque / Masked / Transparent
    blend_mode: str = "None"
    cull_mode: str = "Back"
    depth_bias: float = 0.0
    enable_depth_test: bool = True
    shader: str = "Standard"
    defines: tuple = ()
    uniforms: dict = dataclasses.field(default_factory=dict)
    samplers: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def from_yaml(cls, text: str, name: str = "material") -> "MaterialAsset":
        doc = yaml.safe_load(text) or {}
        return cls(
            name=doc.get("name", name),
            render_queue=doc.get("renderQueue", "Opaque"),
            blend_mode=doc.get("blendMode", "None"),
            cull_mode=doc.get("cullMode", "Back"),
            depth_bias=float(doc.get("depthBias", 0.0)),
            enable_depth_test=bool(doc.get("enableDepthTest", True)),
            shader=doc.get("shader", "Standard"),
            defines=tuple(doc.get("defines", []) or []),
            uniforms=dict(doc.get("uniformsVec4", {}) or {})
            | {k: [v] for k, v in (doc.get("uniformsFloat", {}) or {}).items()},
            samplers=dict(doc.get("samplers", {}) or {}),
        )

    def to_table_row(self) -> dict:
        """Flatten uniforms into MaterialTable row values."""
        albedo = self.uniforms.get("material.albedo", [0.8, 0.8, 0.8, 1.0])
        return {
            "albedo": albedo[:3],
            "metallic": float(self.uniforms.get("material.metallic", [0.0])[0]),
            "roughness": float(self.uniforms.get("material.roughness", [0.6])[0]),
            "emissive": self.uniforms.get("material.emission", [0, 0, 0, 0])[:3],
            "queue": _QUEUE_NAMES.get(self.render_queue, 0),
            "alpha_cutoff": float(
                self.uniforms.get("material.alphaCutoff", [0.5])[0]
            ),
            "opacity": (
                float(albedo[3]) if len(albedo) > 3 and
                _QUEUE_NAMES.get(self.render_queue, 0) == QUEUE_TRANSPARENT
                else 1.0
            ),
        }
