"""Sequence parallelism: one pair's TARGET axis sharded across the mesh.

The reference allocates O(m*n) doubles for fit-mode targets up to 114 KB
(SURVEY.md §5 "long-context"); this module is the TPU-native scaling story
for that axis: the target (and every DP row) is split into contiguous
column blocks, one per device on the mesh's ``seq`` axis, and the row-scan
engine runs under ``shard_map`` with two tiny collectives per row:

  * the diagonal/vertical predecessors at a block's first column live on
    the LEFT neighbor (its last column of the previous row, plus the
    current row's M for the in-row scans) — one ``ppermute`` shift of a
    few scalars per row;
  * the in-row max-plus scans (U state, fit's J, overlap's LEFT chain,
    edit's min chain) decompose exactly: local Hillis-Steele cummax over
    the block, then an ``all_gather`` of the D per-block maxima and a
    local exclusive prefix — the same normalization trick as
    engine/scan.py, so results are bit-identical to the single-device
    engines.

Per row that is O(D) scalars of ICI traffic against O(n/D) VPU work —
latency-bound but tiny; the win is that each device's working rows shrink
by D, so targets far beyond one core's VMEM (or one chip's appetite)
stream at full vector width.

Score-only (traceback start info is computed, pointer emission for the
distributed path lands with the DMA pointer kernel). All modes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aligntools_tpu.params import AlignParams

NEG = -jnp.inf


def _dist_scan_max(cand, seed, axis):
    """Distributed inclusive max-scan of ``cand`` (local block) with a
    global seed folded in at position 0. Returns the local slice of the
    global running max. Exact: plain maxima, no arithmetic."""
    local = jax.lax.cummax(cand)
    d = jax.lax.axis_index(axis)
    tops = jax.lax.all_gather(local[-1], axis)  # (D,)
    ids = jnp.arange(tops.shape[0])
    prefix = jnp.max(jnp.where(ids < d, tops, NEG))
    prefix = jnp.maximum(prefix, seed)
    return jnp.maximum(local, prefix)


def _shift_from_left(row, incoming, axis):
    """Global shift-right-by-one across blocks: lane 0 receives the left
    neighbor's last element (``incoming`` is this device's own last element
    BEFORE the permute; device 0's lane 0 gets ``incoming``'s replacement
    by the caller via where on axis_index)."""
    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    from_left = jax.lax.ppermute(incoming, axis, perm)
    return jnp.concatenate([from_left[None], row[:-1]]), d


def _seqpar_local_fn(mode, use_jump, axis):
    """Per-pair local shard body (one device's target block); used by the
    single-pair path and vmapped over the batch shard in the dp x sp
    composition."""

    def local_fn(q_arr, t_arr, allow, n, params):
        match, mis = params[0], params[1]
        o, e, jp = params[2], params[3], params[4]
        m = params[5].astype(jnp.int32)
        W = t_arr.shape[0]
        d = jax.lax.axis_index(axis)
        jglob = d * W + jnp.arange(1, W + 1, dtype=jnp.int32)  # global cols
        jf = jglob.astype(jnp.float32)
        first = d == 0
        in_n = jglob <= n
        eq_n = jglob == n
        lt_n = jglob <= n - 1

        if mode == "global":
            m0 = jnp.full(W, NEG)
            l0 = jnp.full(W, NEG)
            u0row = params[2] + params[3] * jf  # o + e*j
        elif mode in ("local",):
            m0 = jnp.zeros(W)
            l0 = jnp.zeros(W)
            u0row = jnp.zeros(W)
        elif mode == "fit":
            m0 = jnp.zeros(W)
            l0 = jnp.full(W, NEG)
            u0row = jnp.zeros(W)
        elif mode == "overlap":
            m0 = jnp.full(W, NEG)
            l0 = u0row = jnp.zeros(W)  # unused
        else:  # edit
            m0 = jf
            l0 = u0row = jnp.zeros(W)  # unused
        j0row = jnp.full(W, NEG)

        def border_cols(i):
            """(M, L, U, J) at global column 0 of row i (device 0 only)."""
            i_f = i.astype(jnp.float32)
            if mode == "global":
                return (
                    jnp.where(i == 0, 0.0, NEG),
                    o + e * i_f,
                    jnp.where(i == 0, o, NEG),
                    NEG,
                )
            if mode == "local":
                return 0.0, 0.0, 0.0, NEG
            if mode == "fit":
                z = jnp.where(i == 0, 0.0, NEG)
                return z, NEG, z, NEG
            if mode == "overlap":
                return 0.0, NEG, NEG, NEG
            return i_f, NEG, NEG, NEG  # edit: M(i,0) = i

        def step(carry, qc):
            mp, lp, up, jpr, acc = carry
            i = acc["i"] + 1
            sub = jnp.where(t_arr == qc, match, mis)
            if mode == "edit":
                sub = jnp.where(t_arr == qc, 0.0, mis)
            # previous-row boundary from the left neighbor
            bM, bL, bU, bJ = border_cols(i - 1)
            mp_s, _ = _shift_from_left(mp, mp[-1], axis)
            lp_s, _ = _shift_from_left(lp, lp[-1], axis)
            up_s, _ = _shift_from_left(up, up[-1], axis)
            mp_s = mp_s.at[0].set(jnp.where(first, bM, mp_s[0]))
            lp_s = lp_s.at[0].set(jnp.where(first, bL, lp_s[0]))
            up_s = up_s.at[0].set(jnp.where(first, bU, up_s[0]))
            if mode == "edit":
                # min-plus: row[j]=min(prev[j-1]+sub, prev[j]+1, row[j-1]+1)
                cand = jnp.minimum(mp_s + sub, mp + 1.0)
                # seed = row(i,0) - 0 = i, REPLICATED: _dist_scan_max folds
                # the seed into every device's prefix (it precedes all cols)
                v = -_dist_scan_max(-(cand - jf), -i.astype(jnp.float32), axis)
                row = v + jf
                fin = jnp.max(jnp.where(eq_n, row, NEG))
                fin = jax.lax.pmax(fin, axis)
                acc = {
                    "i": i,
                    "best": jnp.where(i == m, fin, acc["best"]),
                    "aux": acc["aux"],
                }
                return (row, lp, up, jpr, acc), None
            if mode == "overlap":
                dr = jnp.maximum(mp_s + sub, mp + o)
                # seed = M(i,0) - o*0 = 0, replicated (see edit-mode note)
                v = _dist_scan_max(dr - o * jf, jnp.float32(0.0), axis)
                row = v + o * jf
                rowmax = jnp.max(jnp.where(lt_n, row, NEG))
                rowmax = jnp.maximum(jax.lax.pmax(rowmax, axis), 0.0)
                acc = {
                    "i": i,
                    "best": jnp.where(i == m, rowmax, acc["best"]),
                    "aux": acc["aux"],
                }
                return (row, lp, up, jpr, acc), None
            # affine family
            diag = jnp.maximum(jnp.maximum(lp_s, mp_s), up_s)
            if use_jump:
                jp_s, _ = _shift_from_left(jpr, jpr[-1], axis)
                jp_s = jp_s.at[0].set(jnp.where(first, bJ, jp_s[0]))
                diag = jnp.maximum(diag, jp_s)
            m_row = diag + sub
            if mode == "local":
                m_row = jnp.maximum(m_row, 0.0)
            l_row = jnp.maximum(lp + e, mp + o)
            # current-row M boundary for the in-row scans
            m_cur_s, _ = _shift_from_left(m_row, m_row[-1], axis)
            bMi, _, _, _ = border_cols(i)
            m_cur_s = m_cur_s.at[0].set(jnp.where(first, bMi, m_cur_s[0]))
            u_seed = {
                "global": NEG, "local": 0.0, "fit": NEG,
            }[mode]
            cand = m_cur_s + o - e * jf
            v = _dist_scan_max(cand, jnp.float32(u_seed), axis)
            u_row = v + e * jf
            if use_jump:
                jcand = jnp.where(allow > 0.0, m_cur_s + jp, NEG)
                j_row = _dist_scan_max(jcand, jnp.float32(NEG), axis)
            else:
                j_row = jpr
            # per-mode score tracking
            if mode == "global":
                fin = jnp.max(
                    jnp.where(
                        eq_n, jnp.maximum(jnp.maximum(l_row, m_row), u_row),
                        NEG,
                    )
                )
                fin = jax.lax.pmax(fin, axis)
                best = jnp.where(i == m, fin, acc["best"])
            elif mode == "local":
                rowmax = jnp.max(jnp.where(in_n, m_row, NEG))
                rowmax = jax.lax.pmax(rowmax, axis)
                rowmax = jnp.where(i <= m, rowmax, NEG)
                best = jnp.maximum(acc["best"], rowmax)
            else:  # fit
                rowmax = jnp.max(
                    jnp.where(lt_n, jnp.maximum(m_row, l_row), NEG)
                )
                rowmax = jax.lax.pmax(rowmax, axis)
                best = jnp.where(i == m, rowmax, acc["best"])
            acc = {"i": i, "best": best, "aux": acc["aux"]}
            return (m_row, l_row, u_row, j_row, acc), None

        acc0 = {"i": jnp.int32(0), "best": NEG, "aux": jnp.float32(0)}
        (_, _, _, _, acc), _ = jax.lax.scan(
            step, (m0, l0, u0row, j0row, acc0), q_arr.astype(jnp.float32)
        )
        return acc["best"]


    return local_fn


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _seqpar_fill(mode, n_pad, use_jump, mesh, q_arr, t_arr, allow, n, params):
    """Score one pair with the target sharded over mesh('seq').

    q_arr (m_pad,) replicated; t_arr (n_pad,) sharded; allow (n_pad,) f32
    sharded (fit); n scalar; params (8,) f32 [match,mis,o,e,jp,m,0,0].
    """
    axis = "seq"
    local_fn = _seqpar_local_fn(mode, use_jump, axis)
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(q_arr, t_arr, allow, n, params)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _seqpar_fill_batch(mode, n_pad, use_jump, mesh, qs, ts, allows, ns, ps):
    """dp x sp composition: batch axis sharded over mesh('data'), every
    pair's target sharded over mesh('seq'). The per-pair row-scan body
    (with its per-row ppermute/all_gather collectives over 'seq') is
    vmapped over the local batch shard — collectives over 'seq' commute
    with vmap over the batch dimension.

    qs (B, m_pad) P('data', None); ts (B, n_pad) P('data', 'seq');
    allows like ts (f32); ns (B,) P('data'); ps (B, 8) P('data', None).
    Returns scores (B,) P('data')-sharded.
    """
    axis = "seq"

    def local_fn(qs, ts, allows, ns, ps):
        single = _seqpar_local_fn(mode, use_jump, axis)
        return jax.vmap(single)(qs, ts, allows, ns, ps)

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("data", None), P("data", axis), P("data", axis), P("data"),
            P("data", None),
        ),
        out_specs=P("data"),
        check_vma=False,
    )(qs, ts, allows, ns, ps)


def seqpar_batch_scores(
    mode: str,
    pairs,
    params: AlignParams = AlignParams(),
    sites_list=None,
    mesh: Mesh | None = None,
):
    """Batch scoring with BOTH parallel axes: dp over mesh('data'), sp over
    mesh('seq'). Bit-identical to the single-device engines."""
    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs.reshape(2, -1), ("data", "seq"))
    d_data = mesh.shape["data"]
    d_seq = mesh.shape["seq"]
    B = len(pairs)
    Bp = -(-B // d_data) * d_data
    m_pad = max(8, max(len(q) for q, _ in pairs))
    quantum = 128 * d_seq
    n_max = max(len(t) for _, t in pairs)
    n_pad = max(quantum, -(-n_max // quantum) * quantum)
    use_jump = sites_list is not None and mode == "fit"
    qs = np.full((Bp, m_pad), -1, np.int32)
    ts = np.full((Bp, n_pad), -2, np.int32)
    allows = np.ones((Bp, n_pad), np.float32)
    ns = np.ones(Bp, np.int32)
    ps = np.zeros((Bp, 8), np.float32)
    ps[:, :5] = [params.match, params.mismatch, params.gap_open,
                 params.gap_extend, params.jump]
    for k, (q, t) in enumerate(pairs):
        qs[k, : len(q)] = np.frombuffer(q, np.uint8)
        ts[k, : len(t)] = np.frombuffer(t, np.uint8)
        ns[k] = len(t)
        ps[k, 5] = len(q)
        if use_jump and sites_list[k]:
            for sx in sites_list[k]:
                if 0 <= sx < n_pad:
                    allows[k, sx] = 0.0
    args = (
        jax.device_put(jnp.asarray(qs), NamedSharding(mesh, P("data", None))),
        jax.device_put(jnp.asarray(ts), NamedSharding(mesh, P("data", "seq"))),
        jax.device_put(jnp.asarray(allows),
                       NamedSharding(mesh, P("data", "seq"))),
        jax.device_put(jnp.asarray(ns), NamedSharding(mesh, P("data"))),
        jax.device_put(jnp.asarray(ps), NamedSharding(mesh, P("data", None))),
    )
    out = np.asarray(_seqpar_fill_batch(mode, n_pad, use_jump, mesh, *args))
    out = out[:B]
    if mode == "edit":
        return out.astype(np.int64)
    return out.astype(np.float64)


def seqpar_score(
    mode: str,
    q: bytes,
    t: bytes,
    params: AlignParams = AlignParams(),
    sites=None,
    mesh: Mesh | None = None,
):
    """Score one pair with the target sharded across the mesh's devices.

    Exactness matches the single-device engines bit-for-bit. For 'edit'
    the result is the int distance; others return the float score."""
    if mesh is None:
        devs = jax.devices()
        mesh = Mesh(np.asarray(devs), ("seq",))
    D = mesh.devices.size
    m, n = len(q), len(t)
    quantum = 128 * D
    n_pad = max(quantum, -(-n // quantum) * quantum)
    m_pad = max(8, m)
    use_jump = sites is not None and mode == "fit"
    qa = np.full(m_pad, -1, np.int32)
    qa[:m] = np.frombuffer(q, np.uint8)
    ta = np.full(n_pad, -2, np.int32)
    ta[:n] = np.frombuffer(t, np.uint8)
    allow = np.ones(n_pad, np.float32)
    if use_jump:
        for s in sites:
            if 0 <= s < n_pad:
                allow[s] = 0.0
    pv = np.array(
        [params.match, params.mismatch, params.gap_open, params.gap_extend,
         params.jump, m, 0, 0],
        np.float32,
    )
    shard = NamedSharding(mesh, P("seq"))
    rep = NamedSharding(mesh, P())
    args = (
        jax.device_put(jnp.asarray(qa), rep),
        jax.device_put(jnp.asarray(ta), shard),
        jax.device_put(jnp.asarray(allow), shard),
        jax.device_put(jnp.int32(n), rep),
        jax.device_put(jnp.asarray(pv), rep),
    )
    out = float(_seqpar_fill(mode, n_pad, use_jump, mesh, *args))
    if mode == "edit":
        return int(out)
    return out
