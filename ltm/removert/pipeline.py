"""LT-removert + LT-map: dynamic removal, change detection, map update.

Reference: ``Removerter::run`` (``ltremovert/src/Removerter.cpp:1653-1678``):
  Step 0 prep (load, parse keyframes, preclean, global maps)
  Step 1 high-dynamic removal (self visibility check per session)
  Step 2 low-dynamic PD/ND change detection (cross-session kNN + 3×
         visibility re-checks → strong/weak split, weak→strong propagation)
  Step 3 LT-map composition (union + weak-ND + PD) and scan-wise updates.

TPU re-design (not a port): each session's global map is ONE padded array;
every stage is a boolean mask over it — "removing" points never reallocates.
The visibility sweeps stream keyframes through jitted scatter-min kernels
(``ltm.kernels.projection``), kNN stages are tiled MXU matmuls
(``ltm.kernels.knn``), and the delta-map compositions are mask unions +
voxel dedupe.  The reference's per-stage octree re-dedups are unnecessary
here: the map was deduplicated once at construction and points never
duplicate (behavioral simplification, same point sets).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ltm.core.config import RemovertConfig
from ltm.kernels.blocks import (
    block_fused_visibility_images,
    block_sweep_discrepancy,
    block_sweep_discrepancy_vs_images,
    build_block_map_with_slots,
)
from ltm.kernels.knn import chunked_knn_avg_sqdist
from ltm.kernels.projection import (
    apply_pose,
    fused_visibility_images,
    rimg_shape,
    sweep_discrepancy,
    sweep_discrepancy_vs_images,
    winner_mask,
)
from ltm.kernels.voxel import voxel_unique_mask
from ltm.io.pcd import write_pcd
from ltm.removert.session import (
    RemovertInput,
    RemovertSession,
    parse_keyframe_indices,
    parse_keyframes_in_roi,
)
from ltm.utils import count_slots, get_logger, stage_timer

__all__ = ["Removerter", "RemovertResult"]

log = get_logger("ltm.removert")


@dataclass
class RemovertResult:
    """All named point sets as (xyz, mask) pairs over fixed arrays."""

    central: RemovertSession
    query: RemovertSession
    combined_xyz: jax.Array               # concat(central map, query map)
    masks: Dict[str, jax.Array] = field(default_factory=dict)

    def points(self, name: str) -> np.ndarray:
        """Compact a named set to a host (M, 3) array.

        Map-level sets: static_c/dynamic_c/static_q/dynamic_q, coexist_c,
        coexist_q, nd, nd_strong, nd_weak, pd, pd_strong, pd_weak,
        updated, updated_strong.
        """
        m = self.masks[name]
        if name in ("updated", "updated_strong"):
            xyz = self.combined_xyz
        elif name.endswith("_q") or name.startswith("pd"):
            xyz = self.query.map_xyz
        else:
            xyz = self.central.map_xyz
        return np.asarray(xyz)[np.asarray(m)]


class Removerter:
    def __init__(self, cfg: Optional[RemovertConfig] = None):
        self.cfg = cfg or RemovertConfig()
        # id-keyed (map_array, BlockMap, slots) — see _knn_block_map
        self._kbm_cache: dict = {}
        # deferred count logs: point-count observability (the reference logs
        # counts at every stage) WITHOUT mid-pipeline device syncs — an
        # int(mask.sum()) between dispatches stalls the async queue; counts
        # are tiny device scalars collected here and fetched once at the end
        self._log_queue: list = []
        # per-run exact-bound caches (reset by run())
        self._origins = np.zeros((0, 3))
        self._kb_cache: dict = {}
        self._vis_cache: dict = {}
        self._geom_cache: dict = {}
        # per-run fused winner images: session id -> (K, n_pix) filter-res
        # images of the projected static scans (built once in the
        # project_static stage, consumed by every strong-weak filter repeat)
        self._img_cache: dict = {}
        # device mesh for the hot loops (cfg.mesh_devices; the reference's
        # OpenMP-by-default analog at chip scale, Session.cpp:408,491)
        self.mesh = None
        if self.cfg.mesh_devices not in (None, 0, 1):
            from ltm.dist.mesh import mesh_from_config

            self.mesh = mesh_from_config(self.cfg.mesh_devices)
            if self.mesh is not None:
                log.info("removert: sharding hot loops over %d devices",
                         self.mesh.devices.size)

    def _log_counts(self, fmt: str, *vals) -> None:
        """Queue an INFO log whose %d args are device scalars (flushed by
        :meth:`_flush_logs` once the pipeline has been dispatched)."""
        self._log_queue.append((fmt, vals))

    def _flush_logs(self) -> None:
        for fmt, vals in self._log_queue:
            log.info(fmt, *(int(v) if hasattr(v, "dtype") else v for v in vals))
        self._log_queue = []

    # ------------------------------------------------------------------
    def run(self, central_inp: RemovertInput, query_inp: RemovertInput,
            save_directory: Optional[str] = None) -> RemovertResult:
        cfg = self.cfg
        fov = (cfg.vfov, cfg.hfov)
        self._log_queue = []

        # ---------------- Step 0: prep -----------------------------------
        with stage_timer("removert.prep", log):
            c_idx = parse_keyframe_indices(len(central_inp.scans), cfg.start_idx, cfg.end_idx, cfg.keyframe_gap)
            # the query ROI needs only the central keyframe POSES (known from
            # the input), not the built session
            lidar2base = np.asarray(cfg.extrinsic_lidar_to_base, np.float64).reshape(4, 4)
            roi = np.asarray([central_inp.poses[i] @ lidar2base for i in c_idx]).reshape(-1, 4, 4)
            q_idx = parse_keyframes_in_roi(query_inp.poses, roi, cfg.roi_inplace_threshold, cfg.keyframe_gap)
            # exact block budgets need only the keyframe ORIGINS, and session
            # poses are exactly input ∘ lidar2base — so every per-sweep bound
            # is computable BEFORE the sessions are built, which lets the
            # central session's device stages (HD removal, winner pass) run
            # while the query session's host prep (GIL-released native voxel
            # + transfers) proceeds on a pool thread.  Budgets size over the
            # union of both sessions' origins (ND/PD filters sweep one
            # session's map from the other's keyframes) — no in-range block
            # is ever truncated (see _kb/_vis_bound).
            q_eff = np.asarray([query_inp.poses[i] @ lidar2base for i in q_idx],
                               np.float32).reshape(-1, 4, 4)
            self._origins = (np.concatenate([
                roi.astype(np.float32)[:, :3, 3], q_eff[:, :3, 3]])
                if (len(c_idx) + len(q_idx)) else np.zeros((0, 3)))
            self._kb_cache = {}
            self._vis_cache = {}
            self._img_cache = {}
            self._geom_cache = {}
            from concurrent.futures import ThreadPoolExecutor

            ex = ThreadPoolExecutor(max_workers=1)
            f_q = ex.submit(RemovertSession.build, query_inp, cfg, "Query", q_idx)
            central = RemovertSession.build(central_inp, cfg, "Central", c_idx)
            if central.bm is not None:
                self._geom_prefetch(central.bm)   # D2H starts behind the build
        self._log_counts("central: %d keyframes, %d map pts",
                         central.num_keyframes, central.map_mask.sum())

        # ---------------- Step 1: high-dynamic removal --------------------
        # central's device stages overlap the query session's host build
        # (the reference's prep and removal are strictly serial,
        # Removerter.cpp:1653-1678).  The try/finally joins the background
        # build even when a central stage raises, so errors stay clean and
        # the pool thread never outlives the driver.
        try:
            with stage_timer("removert.high_dynamic", log):
                self._remove_high_dynamic(central, fov)
            # projected static coverage at the reprojection resolution —
            # fused with the strong-weak filter's source images: the same
            # per-keyframe winner pass over the same static set produces both
            # (one packed scatter-min instead of two winner projections + an
            # image build; see kernels.projection.packed_winner_image)
            with stage_timer("removert.project_static", log):
                proj_static, imgs = self._project_static_and_images(central, fov)
                central.masks["proj_static"] = proj_static
                self._img_cache[id(central)] = imgs
            with stage_timer("removert.prep", log):
                query = f_q.result()
                if query.bm is not None:
                    self._geom_prefetch(query.bm)
        finally:
            ex.shutdown(wait=True)
        self._log_counts("query: %d keyframes, %d map pts",
                         query.num_keyframes, query.map_mask.sum())
        for sess in (central, query):
            if sess.bm is not None:
                log.info("%s: block map %d blocks x %d cap, fwd bound %.1f m, "
                         "vis bound %.1f m", sess.sess_type, sess.bm.num_blocks,
                         sess.bm.block_capacity, self._fwd_bound(sess),
                         self._vis_bound(sess))
        with stage_timer("removert.high_dynamic", log):
            self._remove_high_dynamic(query, fov)
        with stage_timer("removert.project_static", log):
            proj_static, imgs = self._project_static_and_images(query, fov)
            query.masks["proj_static"] = proj_static
            self._img_cache[id(query)] = imgs

        # ---------------- Step 2: low-dynamic change detection ------------
        with stage_timer("removert.knn_diff", log):
            nd_cand, coexist_c, pd_cand, coexist_q = \
                self._knn_partition_pair(central, query)
        self._log_counts("ND candidates: %d | PD candidates: %d",
                         nd_cand.sum(), pd_cand.sum())

        with stage_timer("removert.strong_weak", log):
            # both directions' repeat loops run interleaved: every host
            # count/overflow fetch overlaps the other direction's device
            # sweeps, and the ND weak→strong 2-NN promotion joins the
            # round-robin as ND's follow-up — its kNN kernel dispatches
            # while PD's sweeps are still repeating (see _filter_strong_many)
            jobs = [
                (central, nd_cand, query, fov, True),
                (query, pd_cand, central, fov, False),
            ]
            sync_mode = os.environ.get("LTM_SYNC_STAGES") == "1"
            if not sync_mode:
                (nd_strong, nd_weak), (pd_strong, pd_weak) = \
                    self._filter_strong_many(jobs, followups={
                        0: lambda r: self._propagate_weak_to_strong_steps(
                            central, *r)})
            else:
                # stage-sync (roofline) mode drains the device at every
                # stage boundary, so the overlap buys nothing — run the
                # promotion as its own sub-stage instead so the sweep
                # repeats' wall attributes against their slot ceiling alone
                # (same sweeps, same decisions, same results either way)
                (nd_strong, nd_weak), (pd_strong, pd_weak) = \
                    self._filter_strong_many(jobs)
                with stage_timer("removert.strong_weak.propagate", log):
                    nd_strong, nd_weak = self._propagate_weak_to_strong(
                        central, nd_strong, nd_weak)
            # reference revertStrongPDMapPointsHavingWeakPDInNear is an empty
            # TODO (Session.cpp:447-450) — intentionally not applied here.

        # ---------------- Step 3: LT-map composition ----------------------
        with stage_timer("removert.compose", log):
            from ltm.ltmap import compose_updated_maps

            comb_xyz, updated, updated_strong = compose_updated_maps(
                central.map_xyz, query.map_xyz, coexist_c, nd_weak,
                coexist_q, pd_cand, pd_strong, cfg.downsample_voxel_size,
            )

        masks = {
            "static_c": central.masks["static"],
            "dynamic_c": central.masks["dynamic"],
            "static_q": query.masks["static"],
            "dynamic_q": query.masks["dynamic"],
            "coexist_c": coexist_c,
            "coexist_q": coexist_q,
            "nd": nd_cand,
            "nd_strong": nd_strong,
            "nd_weak": nd_weak,
            "pd": pd_cand,
            "pd_strong": pd_strong,
            "pd_weak": pd_weak,
            "updated": updated,
            "updated_strong": updated_strong,
        }
        result = RemovertResult(central=central, query=query, combined_xyz=comb_xyz, masks=masks)
        self._flush_logs()

        if save_directory:
            with stage_timer("removert.save", log):
                self._save_artifacts(result, save_directory, fov)
        return result

    # ------------------------------------------------------------------
    # per-sweep exact culling bounds + block budgets
    # ------------------------------------------------------------------
    def _fwd_bound(self, sess: RemovertSession) -> float:
        """Exact bound for forward discrepancy sweeps of a session's own
        scans: a flagged map point satisfies range < scan_pixel − thres and
        a culled farther point can't displace a pixel minimum below the
        bound (blocks.py docstring)."""
        return sess.max_scan_range + self.cfg.diff_threshold + 0.25

    def _vis_bound(self, sess: RemovertSession) -> float:
        """Exact bound for winner (visibility) projections of a session's
        map: the farthest valid block from any viewpoint — a winner can sit
        at any range, so only the map's own extent bounds it (the reference
        projects the whole map per keyframe, Removerter.cpp:452,508,565)."""
        key = id(sess.bm.xyz)
        hit = self._vis_cache.get(key)
        if hit is not None:
            return hit
        centers, radius, valid = self._geom(sess.bm)
        if self._origins.size == 0 or not valid.any():
            b = 0.0
        else:
            d = np.linalg.norm(centers[None] - self._origins[:, None], axis=-1) + radius[None]
            b = float(np.where(valid[None], d, 0.0).max())
        self._vis_cache[key] = b
        return b

    def _geom(self, bm):
        """Host copies of a layout's (centers, radius, block_valid), fetched
        ONCE per block map — ``_kb`` is called with several distinct bounds
        per session and each ``np.asarray`` on a device array is a blocking
        round trip that also drains the dispatch queue mid-stage.  Start the
        D2H copies early with :meth:`_geom_prefetch` (at session-build time)
        so the first `_kb` barely waits."""
        key = id(bm.xyz)
        hit = self._geom_cache.get(key)
        if hit is None:
            self._geom_prefetch(bm)
            hit = (np.asarray(bm.centers), np.asarray(bm.radius),
                   np.asarray(bm.block_valid))
            self._geom_cache[key] = hit
        return hit

    @staticmethod
    def _geom_prefetch(bm) -> None:
        for a in (bm.centers, bm.radius, bm.block_valid):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()

    def _kb(self, bm, bound: float):
        """(k_blocks, max_range) for a sweep over ``bm`` with an exact
        culling bound: ``required_k_blocks`` guarantees no in-range block is
        truncated.  Bounds bucket to 25 m so jit sees few distinct static
        k_blocks values; an explicit cfg.k_blocks acts as a floor."""
        cfg = self.cfg
        if cfg.block_max_range is not None:
            bound = cfg.block_max_range
        bound = float(np.ceil(bound / 25.0) * 25.0)
        key = (id(bm.xyz), bound)
        hit = self._kb_cache.get(key)
        if hit is not None:
            return hit
        from ltm.kernels.blocks import required_k_blocks_np

        need = required_k_blocks_np(*self._geom(bm), self._origins, bound)
        if cfg.k_blocks is not None:
            need = min(max(cfg.k_blocks, need), bm.num_blocks)
        self._kb_cache[key] = (need, bound)
        log.info("block budget: %d/%d blocks within %.0f m", need, bm.num_blocks, bound)
        return need, bound

    def _pack_scale(self, sess: RemovertSession) -> float:
        """Fixed-point scale for the packed winner pass: 2²⁷ units over the
        session's pow-2-bucketed visibility bound (pow-2 keeps the static
        jit arg stable across similar maps).  Resolution B/2²⁷ — ~15 µm at
        B=2 km — far below the 0.1 m decision threshold and the f32 ulp at
        those ranges."""
        if sess.bm is not None:
            b = self._vis_bound(sess)
        else:
            ext = jnp.where(sess.map_mask[:, None], sess.map_xyz, 0.0)
            b = float(jnp.max(jnp.linalg.norm(ext, axis=-1)))
            if self._origins.size:
                b += float(np.linalg.norm(self._origins, axis=-1).max())
        B = float(1 << max(8, int(np.ceil(b + 1.0) - 1).bit_length()))
        return float(2 ** 27) / B

    def _project_static_and_images(self, sess: RemovertSession, fov):
        """One fused winner pass per keyframe over the session's static set:
        returns (visible-from-any-keyframe mask at the reprojection
        resolution α=3 — ``parseScansViaProjection``/``parseStaticScans…``,
        ``Session.cpp:305-360`` — and the (K, n_pix) filter-resolution range
        images of those projected static scans, the source side of
        ``filterStrongND``/``filterStrongPD``)."""
        cfg = self.cfg
        proj_shape = rimg_shape(fov, cfg.reprojection_alpha)
        shape = rimg_shape(fov, cfg.nd_pd_filter_resolution)
        K = sess.num_keyframes
        scale = self._pack_scale(sess)
        if sess.bm is not None and self.mesh is None and cfg.use_occlusion_culling:
            # two-phase occlusion-culled winner pass: near blocks build a
            # provisional packed image; far blocks whose minimum possible
            # range exceeds every provisional pixel in their footprint are
            # provably non-winners and are skipped (kernels/occlusion.py);
            # survivors get one more scatter and the winner test runs
            # against the FINAL image — bit-identical to the full pass
            from ltm.kernels.blocks import block_fused_phase_a, block_fused_phase_b
            from ltm.kernels.occlusion import compact_survivors

            r_near = (self._fwd_bound(sess) if cfg.occlusion_near_range is None
                      else cfg.occlusion_near_range)
            kb_near, r_near_b = self._kb(sess.bm, r_near)
            sel_a, sel_a_valid, packed_imgs, survive = block_fused_phase_a(
                sess.bm, sess.masks["static"], sess.poses_inv[:K],
                sess.poses[:K], fov, shape, proj_shape,
                k_near=kb_near, r_near=r_near_b, scale=scale,
            )
            sel_b, sel_b_valid, k_b = compact_survivors(np.asarray(survive))
            log.info("%s winner pass: %d near + %d/%d far blocks/keyframe",
                     sess.sess_type, kb_near, k_b, sess.bm.num_blocks)
            count_slots((kb_near + k_b) * sess.bm.block_capacity * K)
            sel_ab = jnp.concatenate([sel_a, jnp.asarray(sel_b)], axis=1)
            sel_ab_valid = jnp.concatenate(
                [sel_a_valid, jnp.asarray(sel_b_valid)], axis=1)
            return block_fused_phase_b(
                sess.bm, sess.masks["static"], sess.poses_inv[:K],
                packed_imgs, jnp.asarray(sel_b), jnp.asarray(sel_b_valid),
                sel_ab, sel_ab_valid, fov, shape, proj_shape, scale=scale,
            )
        if sess.bm is not None:
            kb, mr = self._kb(sess.bm, self._vis_bound(sess))
            if self.mesh is not None:
                from ltm.dist.removert import block_fused_visibility_images_sharded

                return block_fused_visibility_images_sharded(
                    self.mesh, sess.bm, sess.masks["static"],
                    sess.poses_inv[:K], sess.poses[:K], fov, shape, proj_shape,
                    k_blocks=kb, max_range=mr, scale=scale,
                )
            count_slots(kb * sess.bm.block_capacity * K)
            return block_fused_visibility_images(
                sess.bm, sess.masks["static"],
                sess.poses_inv[:K], sess.poses[:K], fov, shape, proj_shape,
                k_blocks=kb, max_range=mr, scale=scale,
            )
        if self.mesh is not None:
            from ltm.dist.removert import fused_visibility_images_sharded

            return fused_visibility_images_sharded(
                self.mesh, sess.map_xyz, sess.masks["static"],
                sess.poses_inv[:K], fov, shape, proj_shape, scale=scale,
            )
        return fused_visibility_images(
            sess.map_xyz, sess.masks["static"], sess.poses_inv[:K],
            fov, shape, proj_shape, scale=scale,
        )

    def _scan_images(self, sess: RemovertSession, fov, shape):
        """(K, nrow*ncol) scan range images, cached per (session, shape) —
        shared by every forward sweep at this resolution (remove + revert
        iterations re-project the same scans otherwise)."""
        key = (id(sess), shape)
        hit = self._img_cache.get(key)
        if hit is not None:
            return hit
        import functools

        from ltm.kernels.projection import range_image

        K = sess.num_keyframes
        imgs = jax.jit(
            jax.vmap(functools.partial(range_image, fov=fov, shape=shape))
        )(sess.scans_xyz[:K], sess.scans_mask[:K])
        self._img_cache[key] = imgs
        return imgs

    def _sweep(self, sess: RemovertSession, mask, fov, res):
        shape = rimg_shape(fov, res)
        K = sess.num_keyframes  # padded keyframes are masked but not free
        if sess.bm is not None and self.mesh is None and self.cfg.use_occlusion_culling:
            # occlusion-culled forward sweep: per-(keyframe, block) footprint
            # test against the scan images replaces the global range ball —
            # strictly tighter (the ball bound max_scan_range+thres is the
            # image-wide maximum of the same test) and exact per
            # kernels/occlusion.py (slack = −thres for forward diffs)
            from ltm.kernels.blocks import block_sweep_discrepancy_vs_images_presel
            from ltm.kernels.occlusion import (
                compact_survivors,
                cull_blocks_vs_images,
                effective_range_image,
            )

            bm = sess.bm
            imgs = self._scan_images(sess, fov, shape)
            key = (id(bm.xyz), shape, "fwd_cull")
            hit = self._kb_cache.get(key)
            if hit is None:
                candidate = bm.block_valid
                eff = effective_range_image(imgs, -jnp.inf)
                survive = cull_blocks_vs_images(
                    bm.bmin, bm.bmax, candidate, sess.poses_inv[:K],
                    eff, fov, shape, -self.cfg.diff_threshold)
                sel_idx, sel_valid, k_sel = compact_survivors(np.asarray(survive))
                hit = (jnp.asarray(sel_idx), jnp.asarray(sel_valid))
                log.info("occlusion cull (fwd): %d/%d blocks/keyframe",
                         sel_idx.shape[1], bm.num_blocks)
                self._kb_cache[key] = hit
            sel_idx, sel_valid = hit
            count_slots(sel_idx.shape[1] * bm.block_capacity * K)
            return block_sweep_discrepancy_vs_images_presel(
                bm._replace(mask=mask.reshape(bm.mask.shape)), mask, imgs,
                sess.poses_inv[:K], sel_idx, sel_valid, fov, shape,
                diff_threshold=self.cfg.diff_threshold, reverse=False,
            )
        if sess.bm is not None:
            bm = sess.bm._replace(mask=mask.reshape(sess.bm.mask.shape))
            kb, mr = self._kb(sess.bm, self._fwd_bound(sess))
            if self.mesh is None:
                count_slots(kb * sess.bm.block_capacity * K)
            if self.mesh is not None:
                from ltm.dist.removert import block_sweep_discrepancy_sharded

                return block_sweep_discrepancy_sharded(
                    self.mesh, bm, sess.scans_xyz[:K], sess.scans_mask[:K],
                    sess.poses_inv[:K], sess.poses[:K],
                    fov, shape, k_blocks=kb,
                    max_range=mr,
                    diff_threshold=self.cfg.diff_threshold, reverse=False,
                )
            return block_sweep_discrepancy(
                bm, sess.scans_xyz[:K], sess.scans_mask[:K],
                sess.poses_inv[:K], sess.poses[:K],
                fov, shape, k_blocks=kb,
                max_range=mr,
                diff_threshold=self.cfg.diff_threshold, reverse=False,
            )
        if self.mesh is not None:
            from ltm.dist.sharding import sweep_discrepancy_sharded

            return sweep_discrepancy_sharded(
                self.mesh, sess.map_xyz, mask, sess.scans_xyz[:K],
                sess.scans_mask[:K], sess.poses_inv[:K], fov, shape,
                self.cfg.diff_threshold, False,
            )
        return sweep_discrepancy(
            sess.map_xyz, mask, sess.scans_xyz[:K], sess.scans_mask[:K],
            sess.poses_inv[:K], fov, shape, self.cfg.diff_threshold, False,
        )

    def _remove_high_dynamic(self, sess: RemovertSession, fov):
        """``removeHighDynamicPoints`` (``Removerter.cpp:1580-1604``).

        Default: one ``removeOnce`` per configured resolution (the reference
        run() does ``removeOnce(sess, sess, 2.5)``, ``:1584``).  With
        ``use_self_removert``, runs the full multi-resolution remove → revert
        (at 0.95×res, restoring falsely removed points) → remove loop
        (``selfRemovert``/``revertOnce``, ``Removerter.cpp:1378-1393,908-931``)
        — as mask algebra: remove flips static→dynamic, revert re-partitions
        the dynamic set and returns unflagged points to static."""
        cfg = self.cfg
        cur = sess.map_mask
        dynamic = jnp.zeros_like(cur)

        def remove_once(cur, dynamic, res):
            dyn = self._sweep(sess, cur, fov, res)
            return cur & ~dyn, dynamic | dyn

        def revert_once(cur, dynamic, res):
            flagged = self._sweep(sess, dynamic, fov, res)
            return cur | (dynamic & ~flagged), dynamic & flagged

        if cfg.use_self_removert:
            for i, res in enumerate(cfg.remove_resolution_list):
                # revert resolution: the config list when provided, else the
                # reference's hard-coded 0.95x (``Removerter.cpp:1385``)
                if cfg.revert_resolution_list:
                    revert_res = cfg.revert_resolution_list[min(i, len(cfg.revert_resolution_list) - 1)]
                else:
                    revert_res = 0.95 * res
                for _ in range(max(cfg.repeat_removert_iter, 1)):
                    cur, dynamic = remove_once(cur, dynamic, res)
                    cur, dynamic = revert_once(cur, dynamic, revert_res)
                    cur, dynamic = remove_once(cur, dynamic, res)
                # per-resolution debug snapshot (the reference saves after
                # every resolution: saveCurrentStaticAndDynamicPointCloudGlobal,
                # Removerter.cpp:318-338); masks are cheap, _save_artifacts
                # writes the files
                sess.masks[f"static@{res}"] = cur
                sess.masks[f"dynamic@{res}"] = dynamic
        else:
            for res in cfg.remove_resolution_list:
                cur, dynamic = remove_once(cur, dynamic, res)
                sess.masks[f"static@{res}"] = cur
                sess.masks[f"dynamic@{res}"] = dynamic

        sess.masks["static"] = cur
        sess.masks["dynamic"] = dynamic
        self._log_counts("%s HD removal: %d static / %d dynamic",
                         sess.sess_type, cur.sum(), dynamic.sum())

    def _knn_partition(self, sess: RemovertSession, other: RemovertSession):
        """``extractLowDynPointsViaKnnDiff`` against the other session's
        static map (``Session.cpp:393-427,537-607``).

        The reference queries each *projected static scan* point; the kNN
        verdict depends only on the point (same map point, same target map),
        so we evaluate once per map point and restrict to the projected-
        visible set — identical point sets, no per-keyframe duplication.
        """
        cfg = self.cfg
        eligible = sess.masks["static"] & sess.masks["proj_static"]
        d = self._knn_stat(sess.map_xyz, eligible, other.map_xyz,
                           other.masks["static"], target_base=other.map_mask)
        close = d < cfg.knn_avg_sqdist_threshold
        coexist = eligible & close
        diff = eligible & ~close
        return diff, coexist

    def _knn_partition_pair(self, central: RemovertSession, query: RemovertSession):
        """Both kNN-diff directions with their main chunked kernels dispatched
        BEFORE either direction's overflow bits are fetched — the fetch is a
        host sync, and serializing it between the two directions left the
        device idle for the second kernel's dispatch latency."""
        cfg = self.cfg
        elig_c = central.masks["static"] & central.masks["proj_static"]
        elig_q = query.masks["static"] & query.masks["proj_static"]
        started = []
        for sess, other, elig in ((central, query, elig_c), (query, central, elig_q)):
            st = None
            if cfg.use_chunk_knn and other.map_xyz.shape[0] >= cfg.chunk_knn_min_targets:
                st = self._chunk_knn_start(sess.map_xyz, elig, other.map_xyz,
                                           other.masks["static"],
                                           target_base=other.map_mask)
            started.append(st)
        out = []
        for (sess, other, elig), st in zip(
                ((central, query, elig_c), (query, central, elig_q)), started):
            if st is not None:
                d = self._chunk_knn_finish(*st)
            else:
                d = self._knn_stat(sess.map_xyz, elig, other.map_xyz,
                                   other.masks["static"], target_base=other.map_mask)
            close = d < cfg.knn_avg_sqdist_threshold
            out.extend([elig & ~close, elig & close])
        return tuple(out)

    def _filter_strong(self, sess: RemovertSession, cand: jax.Array,
                       source: RemovertSession, fov, reverse: bool):
        """3× visibility re-checks of a delta map against the source
        session's projected static scans (``filterStrongND``/``filterStrongPD``,
        ``Removerter.cpp:1395-1411``; reversed diff for ND per ``:516``)."""
        (out,) = self._filter_strong_many([(sess, cand, source, fov, reverse)])
        return out

    def _filter_strong_many(self, jobs, followups=None):
        """Run several directions' strong-filter repeat loops interleaved.

        Each direction's loop needs a handful of tiny host reads (survivor
        counts for the pow-2 delta rebuilds + the empty-set exit, layout
        overflow bits, fresh block centers) — and each read forces the host
        to wait for that direction's previously dispatched sweep.  Run as a
        plain sequence (round 4), those waits left the device idle for the
        next sweep's dispatch latency (~1 s/run measured on the 29 ms-RT
        tunnel harness).  Here every direction is a generator that YIELDS
        the device arrays it needs fetched; this round-robin driver
        dispatches the other directions' sweeps before fetching, so the
        device always has queued work while the host blocks.  Same sweeps,
        same decisions, same results — purely a dispatch reordering.

        ``followups``: optional {job index: result -> generator}.  When a
        direction finishes, its follow-up generator (same yield protocol)
        joins the round-robin and its return value replaces the slot's
        result — e.g. the ND weak→strong kNN propagation dispatches while
        the PD direction's sweeps are still repeating."""
        gens = [self._filter_strong_steps(*j) for j in jobs]
        followups = followups or {}
        results: list = [None] * len(gens)
        pending: list = [None] * len(gens)
        from collections import deque

        live = deque()

        def _advance(i, value):
            try:
                req = gens[i].send(value)
            except StopIteration as e:
                results[i] = e.value
                fu = followups.pop(i, None)
                if fu is not None:
                    gens[i] = fu(e.value)
                    return _advance(i, None)
                return False
            for leaf in jax.tree_util.tree_leaves(req):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()   # start D2H early
            pending[i] = req
            return True

        for i in range(len(gens)):
            if _advance(i, None):
                live.append(i)
        while live:
            i = live.popleft()
            if _advance(i, jax.device_get(pending[i])):
                live.append(i)
        return results

    def _filter_strong_steps(self, sess: RemovertSession, cand: jax.Array,
                             source: RemovertSession, fov, reverse: bool):
        """Generator core of one ``_filter_strong`` direction: yields pytrees
        of device arrays whose host values it needs (the caller fetches and
        sends them back), returns (strong, weak)."""
        cfg = self.cfg
        shape = rimg_shape(fov, cfg.nd_pd_filter_resolution)
        cur = cand                       # ALWAYS original map index space
        weak = jnp.zeros_like(cand)
        use_blocks = sess.bm is not None and source.bm is not None
        Ks = source.num_keyframes  # padded poses are identity (phantom origin view)
        # the source side (transform + winner projection + image scatter) is
        # identical across repeats AND identical to the projected-static
        # winner pass — the fused project_static stage built these images
        # once per session (kernels.blocks.block_fused_visibility_images);
        # each repeat only projects the shrinking delta set against them
        imgs = self._img_cache[id(source)]
        dbm = d_slots = None
        sel_idx = sel_valid = None
        kb_eff = mr_t = None
        built_n = 0
        # the candidate count drives the delta build + per-repeat rebuilds;
        # the non-blocked (brute/mesh) path stays sync-free like before
        n_cur = int((yield cand.sum())) if use_blocks else -1
        repeat_counts = [n_cur]
        if use_blocks:
            # target side: a flagged point's range is bounded by the largest
            # source image pixel (≤ source vis bound), plus
            # kValidDiffUpperBound when the diff is reversed (ND)
            from ltm.kernels.blocks import required_k_blocks_np

            from ltm.kernels.projection import VALID_DIFF_UB

            bound_t = self._vis_bound(source) + (VALID_DIFF_UB if reverse else 0.0)
            _, mr_t = self._kb(sess.bm, bound_t)
            bcap = sess.bm.block_capacity
            nb = sess.bm.num_blocks
            kb_bound = float(np.ceil(mr_t / 25.0) * 25.0)

            # The candidate (delta) set is typically a small fraction of the
            # map, and the map's block layout pads it further (delta points
            # share blocks with non-delta ones) — so re-block JUST the delta
            # set into a tight layout: same points, same images, identical
            # per-pixel winner semantics (winners are computed within the
            # masked set either way, whatever its grouping), but every sweep
            # touches only delta-packed blocks.  Because the repeats only
            # SHRINK the candidate set (weak points leave, nothing enters),
            # the build is re-run between repeats whenever the survivors fit
            # a strictly smaller pow-2 layout — later sweeps then touch a
            # pow-2-smaller layout (one ~ms sort + two N-sized gathers per
            # rebuild, amortized over K keyframe sweeps).
            def _delta_blocks(n_del):
                need = max((n_del * 5 + 4 * bcap - 1) // (4 * bcap), 1)
                # floor at 64 blocks: micro-layouts (small candidate sets,
                # e.g. lifelong steady-state rounds) would otherwise mint a
                # fresh jit specialization per pow-2 size for sweeps that
                # are already ~free — 64×cap slots is negligible while one
                # TPU compile is seconds (layout size never changes
                # decisions, only grouping/padding)
                return max(64, 1 << (need - 1).bit_length())

            def _build_delta_start(mask_orig, n_del):
                return build_block_map_with_slots(
                    sess.map_xyz, mask_orig, cfg.block_cell_size,
                    _delta_blocks(n_del), bcap)

            if n_cur:
                dbm_c, ov, slots_c = _build_delta_start(cand, n_cur)
                # one batched fetch: overflow bit + the fresh layout's block
                # geometry (feeds the host-side k_blocks sizing)
                ov_n, cen, rad, bv = yield (ov, dbm_c.centers, dbm_c.radius,
                                            dbm_c.block_valid)
                if not int(ov_n):       # overflow ⇒ degenerate extents: map layout
                    dbm, d_slots = dbm_c, slots_c
                    built_n = n_cur
                    kb_eff = required_k_blocks_np(cen, rad, bv,
                                                  self._origins, kb_bound)
            if dbm is None:
                kb_t, _ = self._kb(sess.bm, bound_t)
                n_cb = int((yield jnp.any(cand.reshape(nb, bcap), axis=1).sum()))
                kb_eff = min(max(min(kb_t, ((n_cb + 127) // 128) * 128), 128), nb)
            # occlusion culling: per (keyframe, block) footprint test against
            # the source images (−thres/+UB slack keeps flags exact — see
            # kernels/occlusion.py).  One cull over the full candidate set
            # serves every repeat (targets only shrink).
            if cfg.use_occlusion_culling and self.mesh is None:
                from ltm.kernels.occlusion import (
                    compact_survivors,
                    cull_blocks_vs_images,
                    effective_range_image,
                )

                bm_c = dbm if dbm is not None else sess.bm
                if dbm is not None:
                    candidate = bm_c.block_valid
                else:
                    candidate = bm_c.block_valid & jnp.any(
                        (bm_c.mask & cand.reshape(nb, bcap)), axis=1)
                slack = float(VALID_DIFF_UB if reverse else -cfg.diff_threshold)
                eff = effective_range_image(imgs, -jnp.inf)
                survive = yield cull_blocks_vs_images(
                    bm_c.bmin, bm_c.bmax, candidate,
                    source.poses_inv[:Ks], eff, fov, shape, slack)
                sel_idx, sel_valid, k_sel = compact_survivors(np.asarray(survive))
                if k_sel >= kb_eff:
                    sel_idx = sel_valid = None   # culling won nothing
                else:
                    sel_idx = jnp.asarray(sel_idx)
                    sel_valid = jnp.asarray(sel_valid)
        # survivor counts per repeat enable the pow-2 shrink rebuilds and the
        # empty-set early exit; the mesh path keeps the sync-free fixed loop
        # (rebuilding a sharded layout per repeat is not worth it there)
        count_repeats = use_blocks and self.mesh is None
        for r in range(cfg.nd_pd_filter_repeats):
            if count_repeats and n_cur == 0:
                break   # nothing left to re-check (flagged ⊆ cur always)
            # rebuild whenever the survivors now fit a strictly smaller pow-2
            # layout (round 4 waited for a full halving of the COUNT, which
            # skipped shrinks the pow-2 sizing would already realize — e.g.
            # 487k -> 271k survivors is 4096 -> 2048 blocks, a halved sweep)
            if (count_repeats and dbm is not None and sel_idx is None
                    and r > 0 and _delta_blocks(n_cur) < dbm.num_blocks):
                dbm_c, ov, slots_c = _build_delta_start(cur, n_cur)
                ov_n, cen, rad, bv = yield (ov, dbm_c.centers, dbm_c.radius,
                                            dbm_c.block_valid)
                if not int(ov_n):       # on overflow keep the old layout
                    dbm, d_slots = dbm_c, slots_c
                    built_n = n_cur
                    kb_eff = required_k_blocks_np(cen, rad, bv,
                                                  self._origins, kb_bound)
            if use_blocks and dbm is not None:
                # layout-space mask of the CURRENT survivors (d_slots: orig
                # index -> flat delta slot, sentinel = one past the end, so
                # mode='drop' ignores non-delta points)
                n_flat = dbm.num_blocks * dbm.block_capacity
                cur_l = jnp.zeros((n_flat,), bool).at[d_slots].set(
                    cur, mode="drop")
            if use_blocks and sel_idx is not None:
                from ltm.kernels.blocks import (
                    block_sweep_discrepancy_vs_images_presel,
                )

                bm_eff = dbm if dbm is not None else sess.bm
                count_slots(sel_idx.shape[1] * bm_eff.block_capacity * Ks)
                flagged = block_sweep_discrepancy_vs_images_presel(
                    bm_eff, cur_l if dbm is not None else cur, imgs,
                    source.poses_inv[:Ks],
                    sel_idx, sel_valid, fov, shape,
                    diff_threshold=cfg.diff_threshold, reverse=reverse,
                )
            elif use_blocks:
                bm_eff = dbm if dbm is not None else sess.bm
                if self.mesh is not None:
                    from ltm.dist.removert import (
                        block_sweep_discrepancy_vs_images_sharded,
                    )

                    flagged = block_sweep_discrepancy_vs_images_sharded(
                        self.mesh, bm_eff, cur_l if dbm is not None else cur,
                        imgs,
                        source.poses_inv[:Ks], source.poses[:Ks],
                        fov, shape, k_blocks=kb_eff,
                        max_range=mr_t,
                        diff_threshold=cfg.diff_threshold, reverse=reverse,
                    )
                else:
                    count_slots(kb_eff * bm_eff.block_capacity * Ks)
                    flagged = block_sweep_discrepancy_vs_images(
                        bm_eff, cur_l if dbm is not None else cur, imgs,
                        source.poses_inv[:Ks], source.poses[:Ks],
                        fov, shape, k_blocks=kb_eff,
                        max_range=mr_t,
                        diff_threshold=cfg.diff_threshold, reverse=reverse,
                    )
            elif self.mesh is not None:
                from ltm.dist.removert import sweep_discrepancy_vs_images_sharded

                flagged = sweep_discrepancy_vs_images_sharded(
                    self.mesh, sess.map_xyz, cur, imgs, source.poses_inv[:Ks],
                    fov, shape, cfg.diff_threshold, reverse,
                )
            else:
                flagged = sweep_discrepancy_vs_images(
                    sess.map_xyz, cur, imgs, source.poses_inv[:Ks],
                    fov, shape, cfg.diff_threshold, reverse,
                )
            if use_blocks and dbm is not None:
                # back to original map indices (a False pad row absorbs the
                # sentinel slot)
                flagged = cur & jnp.concatenate(
                    [flagged, jnp.zeros((1,), bool)])[d_slots]
            weak = weak | flagged
            cur = cur & ~flagged
            if count_repeats:
                n_cur = int((yield cur.sum()))
                repeat_counts.append(n_cur)
        if count_repeats:
            log.info("filter_strong %s %s: candidates per repeat %s",
                     sess.sess_type, "ND" if reverse else "PD", repeat_counts)
        return cur, weak

    def _knn_stat(self, query_xyz, query_mask, target_xyz, target_mask,
                  target_base=None):
        """avg-of-k nearest squared distances.

        Three paths, all making identical threshold decisions:
        chunked block kNN (occupancy-adaptive, the large-map default when the
        target session is block-structured — kernels/chunk_knn.py), grid-
        bucketed kNN (kernels/grid_knn.py, dense-occupancy opt-in), and tiled
        brute force.  Clamped paths are exact for this pipeline's thresholds
        because clamp² >= k·max(threshold) — see the kernel docstrings.

        ``target_base``: the map's validity mask (every per-call
        ``target_mask`` must be a subset) — lets the chunked path size its
        block layout by REAL points instead of padded capacity."""
        cfg = self.cfg
        if cfg.use_chunk_knn and target_xyz.shape[0] >= cfg.chunk_knn_min_targets:
            d = self._chunk_knn_stat(query_xyz, query_mask, target_xyz,
                                     target_mask, target_base)
            if d is not None:
                return d
        if cfg.use_grid_knn:
            from ltm.kernels.grid_knn import build_grid_buckets, grid_knn2_sqdists

            max_t = max(cfg.knn_avg_sqdist_threshold, cfg.weak_to_strong_sqdist_threshold)
            if cfg.grid_cell_size ** 2 < cfg.num_knn_points * max_t:
                raise ValueError(
                    f"grid_cell_size²={cfg.grid_cell_size**2} < k·max_threshold="
                    f"{cfg.num_knn_points * max_t}: grid kNN decisions would be inexact"
                )
            qg, o1 = build_grid_buckets(query_xyz, query_mask, cfg.grid_cell_size,
                                        cfg.grid_n_cells, cfg.grid_cell_capacity)
            tg, o2 = build_grid_buckets(target_xyz, target_mask, cfg.grid_cell_size,
                                        cfg.grid_n_cells, cfg.grid_cell_capacity)
            if int(o1) or int(o2):
                raise ValueError(
                    f"grid kNN overflow (query {int(o1)}, target {int(o2)} pts dropped); "
                    f"raise grid_n_cells ({cfg.grid_n_cells}) or grid_cell_capacity "
                    f"({cfg.grid_cell_capacity})"
                )
            d = grid_knn2_sqdists(qg, tg, num_queries=query_xyz.shape[0], k=cfg.num_knn_points)
            return jnp.mean(d, axis=-1)
        if self.mesh is not None:
            from ltm.dist.sharding import knn_avg_sqdist_sharded

            return knn_avg_sqdist_sharded(
                self.mesh, query_xyz, query_mask, target_xyz, target_mask,
                k=cfg.num_knn_points, tile=8192,
            )
        return chunked_knn_avg_sqdist(
            query_xyz, query_mask, target_xyz, target_mask,
            k=cfg.num_knn_points, tile=8192, query_chunk=16384,
        )

    def _knn_block_map(self, target_xyz, target_base=None):
        """kNN-grained block layout of a map, built ONCE per map object.

        Finer than the sweep blocks (a ~1.4 m query radius wants ~12 m
        cells, not 25 m / 1024-point blocks) and built over the map's REAL
        points (``target_base``; all of them when None); per-call target
        subsets are applied through the chunk kernel's ``target_extra`` mask
        using the returned original-index→slot map.  The block budget is
        sized by the real point count (pow-2 bucketed to bound recompiles),
        not the padded capacity.  Cache is id-keyed with a strong reference
        to the map array (map arrays are immutable and few per run).
        Returns (None, None) if the build overflows (degenerate extents) so
        callers fall back to brute.
        """
        cfg = self.cfg
        cached = self._kbm_cache.get(id(target_xyz))
        if cached is not None and cached[0] is target_xyz:
            return cached[1], cached[2]
        cap = cfg.chunk_knn_block_capacity
        if target_base is None:
            base = jnp.ones((target_xyz.shape[0],), bool)
            n_real = target_xyz.shape[0]
        else:
            base = target_base
            n_real = int(target_base.sum())
        need = max((n_real * cfg.chunk_knn_block_slack + cap - 1) // cap, 1)
        n_blocks = 1 << int(np.ceil(np.log2(need)))
        kbm, ov, slots = build_block_map_with_slots(
            target_xyz, base, cfg.chunk_knn_block_cell, n_blocks, cap)
        if int(ov) > 0:
            log.warning("chunk kNN block build overflow (%d pts); brute fallback", int(ov))
            kbm = slots = None
        self._kbm_cache[id(target_xyz)] = (target_xyz, kbm, slots)
        return kbm, slots

    def _chunk_knn_stat(self, query_xyz, query_mask, target_xyz, target_mask,
                        target_base=None):
        """Occupancy-adaptive chunked kNN statistic (kernels/chunk_knn.py).

        Runs the chunked kernel against the cached per-map block layout;
        chunks whose intersecting-block count overflowed ``k_blocks`` (map-
        edge and Morton-seam chunks, a few % on real geometry) are re-run
        with an 8× block budget, and only chunks that STILL overflow fall
        back to brute force.  Decisions are exact at every pipeline
        threshold: covered chunks by the clamp contract, overflowed chunks
        by escalation/brute force.  Returns None if the block layout could
        not be built so the caller falls through to brute force.

        Split into start (dispatch the main kernel) and finish (fetch
        overflow bits — a host sync — and escalate) so independent
        directions can dispatch before either syncs."""
        st = self._chunk_knn_start(query_xyz, query_mask, target_xyz,
                                   target_mask, target_base)
        if st is None:
            return None
        return self._chunk_knn_finish(*st)

    def _chunk_knn_start(self, query_xyz, query_mask, target_xyz, target_mask,
                         target_base=None):
        cfg = self.cfg
        if self.mesh is not None:
            from functools import partial

            from ltm.dist.removert import chunk_knn_sqdists_sharded

            chunk_knn_sqdists = partial(chunk_knn_sqdists_sharded, self.mesh)
        else:
            from ltm.kernels.chunk_knn import chunk_knn_sqdists

        kbm, slots = self._knn_block_map(target_xyz, target_base)
        if kbm is None:
            return None
        max_t = max(cfg.knn_avg_sqdist_threshold, cfg.weak_to_strong_sqdist_threshold)
        clamp = float(np.sqrt(cfg.num_knn_points * max_t))
        # target subset in blocked layout (slot n_blocks*cap is the dropped-
        # point sentinel; extra is sliced back to the kernel's flat size)
        flat = kbm.num_blocks * kbm.block_capacity
        extra = jnp.zeros((flat + 1,), bool).at[slots].set(target_mask)[:flat]

        n_blocks = int(kbm.num_blocks)
        kb = min(cfg.chunk_knn_k_blocks, n_blocks)
        res = chunk_knn_sqdists(
            query_xyz, query_mask, kbm, extra, clamp,
            k=cfg.num_knn_points, chunk=cfg.chunk_knn_chunk,
            k_blocks=kb, sort_cell=cfg.chunk_knn_sort_cell,
        )
        return (res, chunk_knn_sqdists, kbm, extra, clamp, kb, n_blocks,
                query_xyz, query_mask, target_xyz, target_mask)

    def _chunk_knn_finish(self, res, chunk_knn_sqdists, kbm, extra, clamp,
                          kb, n_blocks, query_xyz, query_mask,
                          target_xyz, target_mask, over_pre=None):
        cfg = self.cfg
        d = jnp.mean(res.sqdists, axis=-1)
        # callers that interleave may have fetched the overflow bits already
        over = over_pre if over_pre is not None else np.asarray(res.chunk_overflow)
        bad = np.flatnonzero(over)
        if not bad.size:
            return d

        # original indices of the queries in overflowed chunks
        ch = cfg.chunk_knn_chunk
        pos = (bad[:, None] * ch + np.arange(ch)).ravel()
        pos = pos[pos < query_xyz.shape[0]]
        idx = np.asarray(res.order)[pos]

        def _pad_subset(idx):
            # pow-2 bucket keeps recompiles bounded
            m = max(1024, 1 << int(np.ceil(np.log2(max(idx.size, 1)))))
            idx_pad = np.zeros(m, np.int32)
            idx_pad[: idx.size] = idx
            idx_j = jnp.asarray(idx_pad)
            sub_mask = jnp.asarray(np.arange(m) < idx.size) & query_mask[idx_j]
            return idx_j, sub_mask

        # Overflowed chunks are Morton-seam/map-edge chunks spanning two far
        # clusters; a bigger block budget resolves them.  (Measured dead end:
        # re-running them at chunk/8 does NOT shrink the bounding ball — a
        # seam window is wide regardless of its length — and the leftovers
        # fall to brute force, 5× slower end-to-end than k_blocks×8.)
        kb2 = min(kb * 8, n_blocks)
        if kb2 > kb:
            idx_j, sub_mask = _pad_subset(idx)
            res2 = chunk_knn_sqdists(
                query_xyz[idx_j], sub_mask, kbm, extra, clamp,
                k=cfg.num_knn_points, chunk=ch,
                k_blocks=kb2, sort_cell=cfg.chunk_knn_sort_cell,
            )
            over2 = np.asarray(res2.chunk_overflow)
            bad2 = np.flatnonzero(over2)
            log.info("chunk kNN: %d/%d chunks escalated to k_blocks=%d "
                     "(%d queries, %d chunks still over)",
                     bad.size, over.size, kb2, idx.size, bad2.size)
            d_sub = jnp.mean(res2.sqdists, axis=-1)
            d = d.at[idx_j].set(jnp.where(sub_mask, d_sub, d[idx_j]))
            if not bad2.size:
                return d
            # invalid (padding) entries Morton-sort to the end, so sorted
            # positions < idx.size are exactly the real queries
            pos2 = (bad2[:, None] * ch + np.arange(ch)).ravel()
            pos2 = pos2[pos2 < idx.size]
            idx = np.asarray(idx_j)[np.asarray(res2.order)[pos2]]

        idx_j, sub_mask = _pad_subset(idx)
        d_sub = chunked_knn_avg_sqdist(query_xyz[idx_j], sub_mask,
                                       target_xyz, target_mask,
                                       k=cfg.num_knn_points)
        d_sub = jnp.minimum(d_sub, clamp * clamp)
        d = d.at[idx_j].set(jnp.where(sub_mask, d_sub, d[idx_j]))
        log.info("chunk kNN: %d queries brute-forced", idx.size)
        return d

    def _propagate_weak_to_strong(self, sess: RemovertSession, strong, weak):
        """``removeWeakNDMapPointsHavingStrongNDInNear``
        (``Session.cpp:452-484``): weak points whose 2-NN average squared
        distance to the strong set is below 1 m² join the strong set."""
        gen = self._propagate_weak_to_strong_steps(sess, strong, weak)
        value = None
        while True:
            try:
                value = jax.device_get(gen.send(value))
            except StopIteration as e:
                return e.value

    def _propagate_weak_to_strong_steps(self, sess: RemovertSession,
                                        strong, weak):
        """Generator form of :meth:`_propagate_weak_to_strong` (yield
        protocol of :meth:`_filter_strong_many`) — run as the ND direction's
        follow-up so its chunk-kNN kernel dispatches while the PD
        direction's filter sweeps are still repeating, and its host fetches
        (strong count, chunk-overflow bits) overlap PD device work."""
        cfg = self.cfg
        n_strong = int((yield strong.sum()))
        if not n_strong:
            return strong, weak
        st = None
        if (cfg.use_chunk_knn
                and sess.map_xyz.shape[0] >= cfg.chunk_knn_min_targets):
            st = self._chunk_knn_start(sess.map_xyz, weak, sess.map_xyz,
                                       strong, target_base=sess.map_mask)
        if st is None:
            d = self._knn_stat(sess.map_xyz, weak, sess.map_xyz, strong,
                               target_base=sess.map_mask)
        else:
            over = yield st[0].chunk_overflow
            d = self._chunk_knn_finish(*st, over_pre=np.asarray(over))
        promote = weak & (d < cfg.weak_to_strong_sqdist_threshold)
        return strong | promote, weak & ~promote

    # ------------------------------------------------------------------
    # artifacts (reference save tree, Removerter.cpp:30-50,1442-1650)
    # ------------------------------------------------------------------
    def _scan_winners(self, xyz, mask, pose_inv, fov, shape):
        local = apply_pose(xyz, pose_inv)
        win, *_ = winner_mask(local, mask, fov, shape)
        return local, win

    @staticmethod
    def _all_keyframe_winners(xyz, mask, pose_invs, fov, shape):
        """(K, N, 3) local points + (K, N) winner masks in one vmapped call."""
        import jax

        def one(Tinv):
            local = apply_pose(xyz, Tinv)
            win, *_ = winner_mask(local, mask, fov, shape)
            return local, win

        return jax.lax.map(one, pose_invs)

    def _save_artifacts(self, result: RemovertResult, out_dir: str, fov):
        cfg = self.cfg
        os.makedirs(out_dir, exist_ok=True)
        for sub in ("scans_updated", "scans_updated_strong", "scans_pd",
                    "scans_pd_strong", "scans_nd_strong", "map_static", "map_dynamic"):
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

        c, q = result.central, result.query
        save = lambda name, pts: write_pcd(os.path.join(out_dir, name), pts)

        if cfg.save_map_pcd:
            save("OriginalNoisyCentralMapGlobal.pcd", np.asarray(c.map_xyz)[np.asarray(c.map_mask)])
            save("OriginalNoisyQueryMapGlobal.pcd", np.asarray(q.map_xyz)[np.asarray(q.map_mask)])
            # per-resolution snapshots, as the reference saves after every
            # removal resolution (Removerter.cpp:318-338); the final
            # resolution is the headline static/dynamic pair
            for sess, tag in ((c, "Central"), (q, "Query")):
                for res in cfg.remove_resolution_list:
                    sm = sess.masks.get(f"static@{res}")
                    if sm is None:
                        continue
                    dm = sess.masks[f"dynamic@{res}"]
                    xyz = np.asarray(sess.map_xyz)
                    save(f"map_static/{tag}StaticMapMapsideGlobalResX{res}.pcd",
                         xyz[np.asarray(sm)])
                    save(f"map_dynamic/{tag}DynamicMapMapsideGlobalResX{res}.pcd",
                         xyz[np.asarray(dm)])
            save("union_map_centralside.pcd", result.points("coexist_c"))
            save("union_map_queryside.pcd", result.points("coexist_q"))
            save("nd_map.pcd", result.points("nd"))
            save("pd_map.pcd", result.points("pd"))
            save("strong_nd_map.pcd", result.points("nd_strong"))
            save("weak_nd_map.pcd", result.points("nd_weak"))
            save("strong_pd_map.pcd", result.points("pd_strong"))
            save("weak_pd_map.pcd", result.points("pd_weak"))
            save("updated_map.pcd", result.points("updated"))
            save("updated_map_strong.pcd", result.points("updated_strong"))

        # high-dynamic scan-side extraction (``extractHighDynPointsViaKnnDiff``
        # + ``*_high_dyn.pcd`` saves, ``Removerter.cpp:1591-1602``): per-scan
        # points whose kNN statistic against the session's own static map
        # exceeds the threshold, merged over keyframes
        hd_sessions = ((c, "central_sess_high_dyn.pcd"), (q, "query_sess_high_dyn.pcd")) \
            if getattr(cfg, "save_high_dyn_maps", True) else ()
        for sess, fname in hd_sessions:
            K = sess.num_keyframes
            R = sess.poses[:K, :3, :3]
            t = sess.poses[:K, :3, 3]
            moved = jnp.einsum("kij,ksj->ksi", R, sess.scans_xyz[:K], precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
            flat = moved.reshape(-1, 3)
            fmask = sess.scans_mask[:K].reshape(-1)
            d = self._knn_stat(flat, fmask, sess.map_xyz,
                               sess.masks["static"], target_base=sess.map_mask)
            dyn = fmask & (np.asarray(d) >= cfg.knn_avg_sqdist_threshold)
            pts = np.asarray(flat)[np.asarray(dyn)]
            if len(pts):
                keep = voxel_unique_mask(jnp.asarray(pts), jnp.ones(len(pts), bool), cfg.downsample_voxel_size)
                pts = pts[np.asarray(keep)]
            save(fname, pts)

        # range-image observability (PNG analog of the reference's rviz
        # topics; see ltm.utils.viz)
        if getattr(cfg, "save_range_image_pngs", False):
            from ltm.kernels.projection import range_image, NO_POINT
            from ltm.utils.viz import save_range_image_png

            res = cfg.remove_resolution_list[0]
            shape = rimg_shape(fov, res)
            png_rows = []
            for k in (0, c.num_keyframes // 2):
                Tinv = c.poses_inv[k]
                scan_img = np.asarray(range_image(c.scans_xyz[k], c.scans_mask[k], fov, shape)).reshape(shape)
                local = apply_pose(c.map_xyz, Tinv)
                map_img = np.asarray(range_image(local, c.map_mask, fov, shape)).reshape(shape)
                diff = np.where((scan_img < NO_POINT) & (map_img < NO_POINT), scan_img - map_img, NO_POINT)
                save_range_image_png(os.path.join(out_dir, f"rimg_scan_{k:04d}.png"), scan_img,
                                     vmin=cfg.rimg_color_min, vmax=cfg.rimg_color_max)
                save_range_image_png(os.path.join(out_dir, f"rimg_map_{k:04d}.png"), map_img,
                                     vmin=cfg.rimg_color_min, vmax=cfg.rimg_color_max)
                save_range_image_png(os.path.join(out_dir, f"rimg_diff_{k:04d}.png"), diff, vmin=-2.0, vmax=2.0)
                png_rows.append((k, c.names[k]))
            # browsable index (the file-based analog of the reference's live
            # rviz image topics, Removerter.cpp:54-71)
            from ltm.utils.viz import write_rimg_index

            write_rimg_index(os.path.join(out_dir, "rimg_index.html"), png_rows)

        if not cfg.save_clean_scans_pcd:
            return

        # scan-wise updates for the central session (Removerter.cpp:1540-1650)
        proj_shape = rimg_shape(fov, cfg.reprojection_alpha)
        comb_mask_u = result.masks["updated"]
        comb_mask_us = result.masks["updated_strong"]
        pd_on_query = result.masks["pd"]
        pd_strong_on_query = result.masks["pd_strong"]
        nd_weak_c = result.masks["nd_weak"]
        nd_strong_c = result.masks["nd_strong"]
        comb = result.combined_xyz
        K = c.num_keyframes
        pose_invs = c.poses_inv[:K]
        upd_l, upd_w = map(np.asarray, self._all_keyframe_winners(comb, comb_mask_u, pose_invs, fov, proj_shape))
        us_l, us_w = map(np.asarray, self._all_keyframe_winners(comb, comb_mask_us, pose_invs, fov, proj_shape))
        pd_l, pd_w = map(np.asarray, self._all_keyframe_winners(q.map_xyz, pd_on_query, pose_invs, fov, proj_shape))
        pds_l, pds_w = map(np.asarray, self._all_keyframe_winners(q.map_xyz, pd_strong_on_query, pose_invs, fov, proj_shape))
        ndw_l, ndw_w = map(np.asarray, self._all_keyframe_winners(c.map_xyz, nd_weak_c, pose_invs, fov, proj_shape))
        nds_l, nds_w = map(np.asarray, self._all_keyframe_winners(c.map_xyz, nd_strong_c, pose_invs, fov, proj_shape))
        for k in range(K):
            name = c.names[k]
            # final per-scan update = updated + weak ND + PD, 0.05 dedupe
            # (Session::updateScansScanwise, Session.cpp:362-380)
            pts = np.concatenate([upd_l[k][upd_w[k]], ndw_l[k][ndw_w[k]], pd_l[k][pd_w[k]]])
            if len(pts):
                keep = voxel_unique_mask(jnp.asarray(pts), jnp.ones(len(pts), bool), cfg.downsample_voxel_size)
                pts = pts[np.asarray(keep)]
            write_pcd(os.path.join(out_dir, "scans_updated", name), pts)
            write_pcd(os.path.join(out_dir, "scans_updated_strong", name), us_l[k][us_w[k]])
            write_pcd(os.path.join(out_dir, "scans_pd", name), pd_l[k][pd_w[k]])
            write_pcd(os.path.join(out_dir, "scans_pd_strong", name), pds_l[k][pds_w[k]])
            write_pcd(os.path.join(out_dir, "scans_nd_strong", name), nds_l[k][nds_w[k]])
