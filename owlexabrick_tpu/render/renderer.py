"""High-level renderer: the analog of the reference's OptixRenderer host
object (exa/OptixRenderer.h:35-96) — owns the device scene, frame state,
accumulation buffer, and the jitted per-frame step.

Differences from the reference, by TPU design:
  * no BVH rebuilds: TF/iso edits only change FrameState; the per-region
    active mask is evaluated inside the jitted frame (exabrick.cu's bounds
    programs become a (N,128) masked reduction)
  * progressive accumulation is a device-side scan-friendly update
  * per-pixel RNG is counter-based (threefry on pixel index + frame id)
    instead of the reference's LCG<16> — deterministic and stateless.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .dvr import (
    RenderConfig,
    accumulate,
    composite_background,
    generate_rays,
    pack_rgba8,
    trace_dvr,
)
from .frame import FrameState, make_frame_state, with_camera
from .scene import to_device
from .surfaces import SurfaceData, trace_surface_pass


def _render_step_impl(scene, fs: FrameState, surf: SurfaceData, accum, *,
                      cfg: RenderConfig, width: int, height: int,
                      pack=None):
    p = width * height
    key = jax.random.fold_in(jax.random.PRNGKey(0x9E3779B9), fs.frame_id)
    jitter = jax.random.uniform(jax.random.fold_in(key, 1), (p, 2))
    offset = jax.random.uniform(jax.random.fold_in(key, 2), (p,))

    o, d = generate_rays(fs, width, height, jitter)

    # surface pass: meshes, contour planes, iso surfaces (exabrick.cu:1475-1529)
    t_hit, bg = trace_surface_pass(
        scene, fs, surf, cfg, o, d, jax.random.fold_in(key, 3),
        screen=(width, height),
    )

    # clip box shrinks the volume interval (clipRay, exabrick.cu:1258-1264)
    from .dvr import ray_box

    chit, c0, c1 = ray_box(
        o, d, fs.clip_lo, fs.clip_hi, jnp.zeros(p), t_hit
    )
    t_start = jnp.where(fs.clip_enabled, jnp.where(chit, c0, jnp.inf), 0.0)
    t_end = jnp.where(fs.clip_enabled, jnp.where(chit, c1, 0.0), t_hit)

    if pack is not None:
        from .wavefront import trace_dvr_packed

        rgba = trace_dvr_packed(
            pack, scene, fs, cfg, o, d, offset,
            t_end_world=t_end, t_start_world=t_start,
        )
    else:
        rgba = trace_dvr(
            scene, fs, cfg, o, d, offset,
            t_end_world=t_end, t_start_world=t_start,
        )
    color = composite_background(rgba, bg)
    new_accum, shown = accumulate(color, accum, fs.frame_id)
    return new_accum, pack_rgba8(shown), shown


@partial(jax.jit, static_argnames=("cfg", "width", "height"))
def render_step(scene, fs: FrameState, surf: SurfaceData, accum, *,
                cfg: RenderConfig, width: int, height: int):
    """One progressive frame: rays -> surfaces -> DVR -> accumulate.

    Returns (new_accum, rgba8 (P,) uint32, linear color (P,3)).
    """
    return _render_step_impl(scene, fs, surf, accum, cfg=cfg,
                             width=width, height=height)


@partial(jax.jit, static_argnames=("cfg", "width", "height"))
def render_step_packed(pack, scene, fs: FrameState, surf: SurfaceData,
                       accum, *, cfg: RenderConfig, width: int, height: int):
    """render_step with the row-packed wavefront DVR (render/wavefront.py)
    — same semantics, ~2 orders of magnitude fewer gather rows."""
    return _render_step_impl(scene, fs, surf, accum, cfg=cfg,
                             width=width, height=height, pack=pack)


class Renderer:
    """Stateful convenience wrapper used by the viewer/CLI."""

    def __init__(
        self,
        scene,
        width: int = 1024,
        height: int = 1024,
        cfg: Optional[RenderConfig] = None,
        surfaces: Optional[SurfaceData] = None,
        frame_state: Optional[FrameState] = None,
    ):
        self.scene = to_device(scene)
        # host copy for offline builders (level grids, wavefront pack):
        # reading device arrays back through a remote TPU tunnel is slow
        self._scene_host = scene
        self.width = width
        self.height = height
        self.cfg = cfg or RenderConfig(num_channels=1)
        self.surf = surfaces or SurfaceData.empty()
        if frame_state is None:
            cam = Camera.look_at(
                from_=np.asarray(scene.world_bounds_hi) * 2.0,
                at=0.5
                * (
                    np.asarray(scene.world_bounds_lo)
                    + np.asarray(scene.world_bounds_hi)
                ),
                up=[0, 1, 0],
                fovy_degrees=60.0,
                width=width,
                height=height,
            )
            frame_state = make_frame_state(cam, self.cfg.num_channels)
            frame_state = dataclasses.replace(
                frame_state,
                clip_lo=np.asarray(scene.world_bounds_lo),
                clip_hi=np.asarray(scene.world_bounds_hi),
            )
        self.fs = frame_state
        self.reset_accumulation()

    # -- state updates (each resets accumulation like the reference's
    # resetAccumulation, exa/viewer.cpp:257-260) ------------------------
    def reset_accumulation(self):
        self.accum = jnp.zeros((self.width * self.height, 4), jnp.float32)
        self.fs = dataclasses.replace(self.fs, frame_id=np.int32(0))

    def update_camera(self, camera: Camera):
        self.fs = with_camera(self.fs, camera)
        self.reset_accumulation()

    def update_xf(self, channel: int, colors, opacities, domain,
                  opacity_scale: float = 1.0):
        lut = np.asarray(self.fs.xf_lut).copy()
        lut[channel, :, :3] = colors
        lut[channel, :, 3] = opacities
        dom = np.asarray(self.fs.xf_domain).copy()
        dom[channel] = domain
        self.fs = dataclasses.replace(
            self.fs,
            xf_lut=lut,
            xf_domain=dom,
            xf_opacity_scale=np.float32(opacity_scale),
        )
        self.reset_accumulation()

    def update_dt(self, dt: float):
        self.fs = dataclasses.replace(self.fs, dt=np.float32(dt))
        self.reset_accumulation()

    def update_iso_values(self, values, channels, enabled):
        self.fs = dataclasses.replace(
            self.fs,
            iso_value=np.asarray(values, np.float32),
            iso_channel=np.asarray(channels, np.int32),
            iso_enabled=np.asarray(enabled, bool),
        )
        self.reset_accumulation()

    def update_contour_planes(self, normals, offsets, channels, enabled):
        n = np.asarray(normals, np.float32)
        n = n / np.linalg.norm(n, axis=-1, keepdims=True)
        self.fs = dataclasses.replace(
            self.fs,
            contour_normal=n,
            contour_offset=np.asarray(offsets, np.float32),
            contour_channel=np.asarray(channels, np.int32),
            contour_enabled=np.asarray(enabled, bool),
        )
        self.reset_accumulation()

    def set_clip_box(self, enabled: bool, lo=None, hi=None):
        self.fs = dataclasses.replace(
            self.fs,
            clip_enabled=np.bool_(enabled),
            clip_lo=np.asarray(lo, np.float32) if lo is not None else self.fs.clip_lo,
            clip_hi=np.asarray(hi, np.float32) if hi is not None else self.fs.clip_hi,
        )
        self.reset_accumulation()

    def resize(self, width: int, height: int):
        self.width = width
        self.height = height
        self.reset_accumulation()

    # -- fast (slab-sweep) path ------------------------------------------
    def enable_fast_path(self) -> bool:
        """Switch DVR to the slab-sweep fast path when the camera is
        axis-aligned and no surface feature needs the wavefront pass.
        Returns True when active."""
        from .slabs import (
            SlabConfig,
            camera_to_voxel,
            check_separable,
            principal_axis,
        )

        # Every AO configuration stays on the fast path: iso-only AO
        # uses the sweep shadow volumes (render/ao_sweep), geometric AO
        # is dense prim intersections inside the surface pass, and mesh
        # AO with iso occluders combines the two under one pooled-
        # direction estimator (ao_combined in _render_fast).
        # the sweep operates in voxel space (remap transform applied to
        # the camera, exa/Config.cpp:23-44)
        cam = camera_to_voxel(
            self._camera_from_fs(), np.asarray(self.scene.voxel_from_world)
        )
        view = np.asarray(cam.dir00) + 0.5 * (
            self.width * np.asarray(cam.dir_du)
            + self.height * np.asarray(cam.dir_dv)
        )
        axis = principal_axis(view)
        _grids = self._grids_for

        if check_separable(cam, axis):
            grids = _grids(axis)
            cam_r = None  # the plain voxel-space camera sweeps directly
        else:
            # arbitrary orientation: exact shear-warp factorization —
            # sweep an axis-aligned intermediate camera over the same ray
            # pencil, then one 2-D homography warp (render/shearwarp.py).
            # Axes are tried least-oblique first (_pick_shearwarp).
            pick = self._pick_shearwarp(cam)
            if pick is not None:
                grids = _grids(pick[0])
                cam_r = "shearwarp"
            else:
                # frustum too oblique for EVERY shear-warp axis (wide-fov
                # near-diagonal views): fall back to the reorientation
                # preview — bounded time, same fallback _render_fast uses
                # mid-orbit
                from .slabs import reorient_grids

                grids, cam_r = reorient_grids(_grids(2), cam)
        extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
        finest = float(min(1 << l for l in grids.levels))
        nslabs = int(np.ceil(extent / (float(self.fs.dt) * finest)))
        self._fast = (
            grids,
            SlabConfig(
                num_channels=self.cfg.num_channels,
                nslabs=nslabs,
                extent_z=extent,
                gradient_shading_dvr=self.cfg.gradient_shading_dvr,
                gradient_shading_iso=self.cfg.gradient_shading_iso,
                colormap_channel=self.cfg.colormap_channel,
                adaptive_stride=self.cfg.adaptive_stride,
            ),
            cam_r,
        )
        return True

    def _pick_shearwarp(self, cam_v):
        """Least-oblique shear-warp factorization of a voxel-frame camera.

        Scores each sweep axis by the worst corner-ray alignment
        min_corners |r_axis| / |r| (with a sign change scoring -inf) and
        tries axes best-first, so mid-orbit frames keep the exact fast
        path as long as *any* axis admits the factorization — the
        reference renders every camera at full rate
        (exabrick.cu:1662-1699).  Returns (axis, ShearWarp) or None when
        every axis fails (caller must use a bounded-time preview, never
        the minutes-long exact wavefront frame)."""
        from .shearwarp import inter_dims, setup_shearwarp

        d00 = np.asarray(cam_v.dir00, np.float64)
        du = np.asarray(cam_v.dir_du, np.float64)
        dv = np.asarray(cam_v.dir_dv, np.float64)
        corners = np.stack([
            d00 + u * du + v * dv
            for u, v in ((0.0, 0.0), (self.width, 0.0),
                         (0.0, self.height), (self.width, self.height))
        ])  # (4, 3) world/voxel (x, y, z)
        rn = np.linalg.norm(corners, axis=1)
        scores = np.empty(3)
        for axis in range(3):
            ra = corners[:, axis]
            if np.any(ra > 0) and np.any(ra < 0):
                scores[axis] = -np.inf
            else:
                scores[axis] = float(np.min(np.abs(ra) / rn))
        iw, ih = inter_dims(self.width, self.height)
        for axis in np.argsort(-scores):
            if not np.isfinite(scores[axis]):
                break
            sw = setup_shearwarp(
                cam_v, int(axis), self.width, self.height, iw, ih
            )
            if sw is not None:
                return int(axis), sw
        return None

    def _grids_for(self, axis: int):
        """Level grids for a sweep axis — cached: they depend only on the
        axis, not the camera, so orbiting never re-scatters the bricks."""
        from .slabs import grids_from_scene

        cache = getattr(self, "_grids_cache", None)
        if cache is None:
            cache = self._grids_cache = {}
        if axis not in cache:
            cache[axis] = grids_from_scene(
                getattr(self, "_scene_host", self.scene), axis=axis
            )
        return cache[axis]

    @staticmethod
    def _grid_to_voxel_normals(n_grid, axis: int):
        """(P, 3) grid-frame (z, y, x) normals -> voxel (x, y, z)."""
        other = [a for a in (2, 1, 0) if a != axis]
        perm = (axis, *other)
        cols = [None, None, None]
        for k, pax in enumerate(perm):
            cols[pax] = n_grid[:, k]
        return jnp.stack(cols, axis=1)

    def _ao_shadow_exact(self, pos_w, n_w, key, rw, rh):
        """Progressive EXACT AO: cfg.ao_samples cosine-hemisphere rays
        per pixel per frame, each occlusion-tested against the exact
        surfaces (meshes/streamlines and, when enabled, the wavefront
        iso march) — the reference's own estimator (exabrick.cu:
        1612-1645), amortized into progressive accumulation instead of
        blocking on a converged pass.  ``key`` is frame-seeded, so the
        accumulated frames average over the hemisphere exactly like the
        reference's progressive refinement."""
        from .surfaces import _nearest_surface, _onb

        p_ = pos_w.shape[0]
        u, v = _onb(n_w)
        fns = jax.jit(
            _nearest_surface,
            static_argnames=("cfg", "include_contours", "include_iso",
                             "screen"),
        )
        hits = jnp.zeros(p_, jnp.float32)
        for s in range(self.cfg.ao_samples):
            r = jax.random.uniform(jax.random.fold_in(key, s), (p_, 2))
            rr = jnp.sqrt(r[:, 0])
            theta = 2.0 * jnp.pi * r[:, 1]
            sp = jnp.stack(
                [rr * jnp.cos(theta), rr * jnp.sin(theta),
                 jnp.sqrt(1.0 - r[:, 0])], -1,
            )
            dir_ = sp[:, 0:1] * u + sp[:, 1:2] * v + sp[:, 2:3] * n_w
            dir_ = dir_ / jnp.maximum(
                jnp.linalg.norm(dir_, axis=-1, keepdims=True), 1e-20
            )
            at, *_ = fns(
                self.scene, self.fs, self.surf, self.cfg,
                pos_w + n_w * 1e-3, dir_,
                jnp.full(p_, 1e-4, jnp.float32),
                jnp.full(p_, 1.0, jnp.float32) * self.fs.ao_length,
                include_contours=False,
                include_iso=self.cfg.iso_surfaces,
                current_timestep=self.fs.tracer_timestep,
                screen=(rw, rh),
            )
            hits = hits + jnp.isfinite(at)
        shadow = hits / self.cfg.ao_samples
        return jnp.where(jnp.asarray(self.fs.ao_enabled), shadow, 0.0)

    def _ao_lattice_dev(self):
        """Device copies of the finest-lattice AO field (cached)."""
        lat = getattr(self, "_ao_lat", None)
        if lat is None:
            from .ao_sweep import build_ao_lattice
            from .slabs import grids_from_scene

            g_np = grids_from_scene(
                getattr(self, "_scene_host", self.scene), axis=2,
                device=False,
            )
            val, occ, lo, cwf = build_ao_lattice(g_np)
            lat = (jnp.asarray(val), jnp.asarray(occ),
                   jnp.asarray(lo), cwf)
            self._ao_lat = lat
        return lat

    def _camera_from_fs(self) -> Camera:
        return Camera(
            pos=np.asarray(self.fs.cam_pos),
            dir00=np.asarray(self.fs.cam_dir00),
            dir_du=np.asarray(self.fs.cam_du),
            dir_dv=np.asarray(self.fs.cam_dv),
        )

    def _sweep_rays_world(self, grids, cam, lattice, rw: int, rh: int):
        """Per-pixel world rays matching the sweep parameterization.

        The sweep advances p = o + s*r along the (possibly lattice-
        generated) voxel-frame ray r; a world-space hit at parameter t
        along the unit direction corresponds to sweep scale s = t/|r_w|.
        Returns (o_w (P,3), d_unit (P,3), rnorm (P,))."""
        from .slabs import permute_camera

        axis = grids.axis
        if lattice is not None:
            _, dir00, _, _ = permute_camera(cam, axis)
            rx = np.asarray(lattice[0], np.float32)
            ry = np.asarray(lattice[1], np.float32)
            rp = np.empty((rh, rw, 3), np.float32)
            rp[..., 0] = float(dir00[0])
            rp[..., 1] = ry[:, None]
            rp[..., 2] = rx[None, :]
            other = [a for a in (2, 1, 0) if a != axis]
            perm = (axis, *other)
            rv = np.empty((rh, rw, 3), np.float32)
            for k, pax in enumerate(perm):
                rv[..., pax] = rp[..., k]
        else:
            i = np.arange(rw, dtype=np.float32) + 0.5
            j = np.arange(rh, dtype=np.float32) + 0.5
            rv = (
                np.asarray(cam.dir00)[None, None]
                + i[None, :, None] * np.asarray(cam.dir_du)[None, None]
                + j[:, None, None] * np.asarray(cam.dir_dv)[None, None]
            )
        r = np.asarray(self.scene.voxel_from_world)[:, :3]
        dw = rv.reshape(-1, 3) @ np.linalg.inv(r).T.astype(np.float32)
        rnorm = np.linalg.norm(dw, axis=-1).astype(np.float32)
        o_w = np.broadcast_to(
            np.asarray(self.fs.cam_pos, np.float32), dw.shape
        )
        return o_w, (dw / rnorm[:, None]).astype(np.float32), rnorm

    def _render_fast(self) -> np.ndarray:
        import dataclasses as _dc

        from .dvr import accumulate, pack_rgba8
        from .slabs import camera_to_voxel, render_slabs_camera

        grids, scfg, cam_r = self._fast
        key = jax.random.fold_in(
            jax.random.PRNGKey(0x51AB), self.fs.frame_id
        )
        # per-frame sub-pixel jitter as a whole-grid shift (separability)
        jx = float(jax.random.uniform(jax.random.fold_in(key, 0), ())) - 0.5
        jy = float(jax.random.uniform(jax.random.fold_in(key, 1), ())) - 0.5

        shear = None
        if cam_r == "shearwarp":
            # exact tilted camera: factorize per frame (cheap host math —
            # orbiting re-derives the axis/lattice without grid rebuilds);
            # axes are tried least-oblique first so mid-orbit frames stay
            # on the exact path whenever any axis admits it
            cam_v = camera_to_voxel(
                self._camera_from_fs(),
                np.asarray(self.scene.voxel_from_world),
            )
            pick = self._pick_shearwarp(cam_v)

            def slabs_for(grids):
                # slab spacing = dt * finest cell width over the sweep
                # extent (integrateBrick's dt, exabrick.cu:1129)
                extent = float(grids.bounds_hi[0] - grids.bounds_lo[0])
                finest = float(min(1 << l for l in grids.levels))
                return _dc.replace(
                    scfg,
                    nslabs=int(np.ceil(
                        extent / (float(self.fs.dt) * finest)
                    )),
                    extent_z=extent,
                )

            if pick is None:
                # frustum too oblique for every axis mid-orbit: render
                # this frame through the bounded-time reorientation
                # preview (the same fallback enable_fast_path takes —
                # NEVER the minutes-long exact wavefront frame)
                from .slabs import reorient_grids

                grids, cam_r = reorient_grids(self._grids_for(2), cam_v)
                scfg = slabs_for(grids)
                cam = Camera(
                    pos=cam_r.pos,
                    dir00=cam_r.dir00 + jx * cam_r.dir_du
                    + jy * cam_r.dir_dv,
                    dir_du=cam_r.dir_du,
                    dir_dv=cam_r.dir_dv,
                )
                lattice = None
                rw, rh = self.width, self.height
            else:
                axis, shear = pick
                grids = self._grids_for(axis)
                scfg = slabs_for(grids)
                # lattice-phase jitter (the intermediate rays move each
                # frame; the warp compensates so screen positions stay put)
                kx = jx
                ky = jy
                lattice = shear.lattice(kx, ky)
                cam = shear.camera
                rw, rh = shear.width, shear.height
        else:
            cam = cam_r if cam_r is not None else camera_to_voxel(
                self._camera_from_fs(),
                np.asarray(self.scene.voxel_from_world),
            )
            cam = Camera(
                pos=cam.pos,
                dir00=cam.dir00 + jx * cam.dir_du + jy * cam.dir_dv,
                dir_du=cam.dir_du,
                dir_dv=cam.dir_dv,
            )
            lattice = None
            rw, rh = self.width, self.height

        bg = jnp.zeros(3)
        t_stop = None
        t_start = None

        # geometric surface pass: meshes, streamlines, contour planes on
        # the sweep's own rays (traceSurfaces, exabrick.cu:1475-1529);
        # implicit iso surfaces are rendered by the slab iso sweep below
        include_contours = bool(np.any(self.fs.contour_enabled))
        need_surf = (
            self.surf.num_tris > 0
            or self.surf.num_segments > 0
            or include_contours
        )
        clip = bool(self.fs.clip_enabled)
        # AO configurations on the fast path (raygen AO,
        # exabrick.cu:1612-1645): iso-only AO uses the sweep shadow
        # volumes; geometric AO runs as dense prim intersections inside
        # trace_surface_pass; mesh AO *with* iso occluders combines the
        # two under one pooled-direction estimator (ao_combined)
        ao_combined = (
            self.cfg.ao_samples > 0
            and self.cfg.iso_surfaces
            and (self.surf.num_tris > 0 or self.surf.num_segments > 0)
        )
        ao_fast = (self.cfg.ao_samples > 0 and self.cfg.iso_surfaces
                   and self.cfg.gradient_shading_iso
                   and not ao_combined)
        t_surf = None
        geom = None  # (t_sweep, n_world, base, ambient) for ao_combined
        if need_surf or clip or ao_fast or ao_combined:
            o_w, d_unit, rnorm = self._sweep_rays_world(
                grids, cam, lattice, rw, rh
            )
        if need_surf and ao_combined:
            # shading is deferred until the unified AO shadow is known
            from .surfaces import _nearest_surface

            fns = jax.jit(
                _nearest_surface,
                static_argnames=("cfg", "include_contours",
                                 "include_iso", "screen"),
            )
            p_ = o_w.shape[0]
            t_g, n_w_g, base_g, amb_g, _kind = fns(
                self.scene, self.fs, self.surf, self.cfg,
                o_w, d_unit,
                jnp.full(p_, 1e-6, jnp.float32),
                jnp.full(p_, 2e10, jnp.float32),
                include_contours=include_contours, include_iso=False,
                current_timestep=self.fs.tracer_timestep,
                screen=(rw, rh),
            )
            t_w = jnp.where(jnp.isfinite(t_g), t_g, 2e10)
            geom = (t_w / rnorm, n_w_g, base_g, amb_g)
            t_surf = geom[0]
            t_stop = t_surf
            bg = jnp.zeros((p_, 3), jnp.float32)  # shaded after AO
        elif need_surf:
            from .surfaces import trace_surface_pass

            key_s = jax.random.fold_in(key, 3)
            fsurf = jax.jit(
                trace_surface_pass,
                static_argnames=("cfg", "include_iso",
                                 "include_contours", "screen"),
            )
            t_w, bg_s = fsurf(
                self.scene, self.fs, self.surf, self.cfg,
                o_w, d_unit, key_s,
                include_iso=False, include_contours=include_contours,
                screen=(rw, rh),
            )
            t_surf = t_w / rnorm  # world t -> sweep scale
            t_stop = t_surf
            bg = bg_s

        if self.cfg.iso_surfaces:
            # iso sweep: its hit depth caps the volume interval
            # (integrateVolume t1 = min(t1, surface t),
            # exabrick.cu:1675-1680); nearest of iso/geometry wins as the
            # background (traceSurfaces comparator)
            from .slabs import (
                permute_camera,
                render_slabs_iso,
                separable_mapping,
            )

            axis = grids.axis
            (swapped,) = separable_mapping(cam, axis)
            pos, dir00, du, dv = permute_camera(cam, axis)
            icfg = _dc.replace(scfg, flip=bool(dir00[0] < 0))
            want_n = (self.cfg.gradient_shading_iso or ao_fast
                      or ao_combined)
            f = jax.jit(
                render_slabs_iso,
                static_argnames=("cfg", "width", "height", "return_depth",
                                 "return_normals"),
            )
            iso_n = None
            iso_cos = None
            if not swapped:
                out = f(grids, self.fs, icfg, pos, dir00,
                        du, dv, rw, rh, return_depth=True,
                        lattice=lattice, return_normals=want_n)
                iso_rgba, t_iso = out[0], out[1]
                if want_n:
                    iso_n, iso_cos = out[2], out[3]
            else:
                out = f(grids, self.fs, icfg, pos, dir00,
                        dv, du, rh, rw, return_depth=True,
                        return_normals=want_n)
                iso_rgba, t_iso = out[0], out[1]
                iso_rgba = iso_rgba.reshape(
                    rw, rh, 4
                ).transpose(1, 0, 2).reshape(-1, 4)
                t_iso = t_iso.reshape(rw, rh).T.reshape(-1)
                if want_n:
                    iso_n = out[2].reshape(rw, rh, 3).transpose(
                        1, 0, 2
                    ).reshape(-1, 3)
                    iso_cos = out[3].reshape(rw, rh).T.reshape(-1)
            iso_bg = iso_rgba[:, :3] * iso_rgba[:, 3:4]

            if want_n:
                # raygen surface shading (exabrick.cu:1644-1650): the
                # iso PRD base color (already .3+.7-shaded) is scaled by
                # |dir . Ng| * (1 - AO shadow)
                n_vox = self._grid_to_voxel_normals(iso_n, grids.axis)
                has_n = jnp.linalg.norm(n_vox, axis=-1) > 0.0
                cosf = iso_cos
                shadow = jnp.zeros(rw * rh, jnp.float32)
                if ao_fast:
                    m = np.asarray(self.scene.voxel_from_world)
                    key_ao = jax.random.fold_in(key, 7)
                    if getattr(self, "ao_exact", False):
                        # exact AO (progressive): per-frame hemisphere
                        # rays vs the exact surfaces
                        t_w = t_iso * rnorm
                        hit_w = o_w + t_w[:, None] * d_unit
                        n_w = n_vox @ jnp.asarray(
                            np.asarray(m[:, :3], np.float32))
                        n_w = n_w / jnp.maximum(
                            jnp.linalg.norm(n_w, axis=-1, keepdims=True),
                            1e-20,
                        )
                        shadow = self._ao_shadow_exact(
                            jnp.asarray(hit_w), n_w, key_ao, rw, rh
                        )
                    else:
                        from .ao_sweep import ao_shadow_fast

                        lat = self._ao_lattice_dev()
                        t_w = t_iso * rnorm
                        hit_w = o_w + t_w[:, None] * d_unit
                        hit_v = (
                            jnp.asarray(hit_w) @ jnp.asarray(m[:, :3].T)
                            + jnp.asarray(m[:, 3])
                        )
                        shadow = ao_shadow_fast(
                            lat, self.fs, hit_v[:, ::-1], n_vox[:, ::-1],
                            key_ao, ao_samples=self.cfg.ao_samples,
                            ao_dirs=self.cfg.ao_dirs,
                        )
                        shadow = jnp.where(
                            jnp.asarray(self.fs.ao_enabled), shadow, 0.0
                        )
                if self.cfg.gradient_shading_iso and not ao_combined:
                    iso_bg = jnp.where(
                        has_n[:, None],
                        iso_bg * (cosf * (1.0 - shadow))[:, None],
                        iso_bg,
                    )

            if t_surf is None:
                bg = iso_bg
                t_stop = t_iso
            else:
                iso_wins = t_iso < t_surf
                bg = jnp.where(iso_wins[:, None], iso_bg, bg)
                t_stop = jnp.minimum(t_iso, t_surf)

            if ao_combined:
                # unified AO over the visible surface (iso or geometry
                # winner): lattice shadow volumes give the iso
                # occlusion, dense prim intersections along the same
                # per-pixel pool directions give the geometric occlusion
                # (raygen AO vs all surfaces but contour planes,
                # exabrick.cu:1612-1645); shading is applied here with
                # the combined shadow
                from .ao_sweep import ao_shadow_fast
                from .surfaces import _nearest_surface as _ns

                t_sw_g, n_w_g, base_g, amb_g = geom
                m = np.asarray(self.scene.voxel_from_world)
                minv = np.linalg.inv(m[:, :3])
                p_ = rw * rh
                t_eff = jnp.minimum(t_iso, t_sw_g)
                pos_w = o_w + (t_eff * rnorm)[:, None] * d_unit
                # winner normals, world and voxel-zyx frames (row
                # vectors: n_vox = n_w @ inv(M), n_w = n_vox @ M)
                n_w_iso = n_vox @ jnp.asarray(m[:, :3])
                n_w_iso = n_w_iso / jnp.maximum(
                    jnp.linalg.norm(n_w_iso, axis=-1, keepdims=True),
                    1e-20,
                )
                n_vox_g = n_w_g @ jnp.asarray(minv)
                n_vox_g = n_vox_g / jnp.maximum(
                    jnp.linalg.norm(n_vox_g, axis=-1, keepdims=True),
                    1e-20,
                )
                n_w_eff = jnp.where(
                    iso_wins[:, None], n_w_iso, n_w_g
                )
                n_vox_eff = jnp.where(
                    iso_wins[:, None], n_vox, n_vox_g
                )
                pos_v = pos_w @ jnp.asarray(m[:, :3].T) + jnp.asarray(
                    m[:, 3]
                )

                def occ_geom(d_pix):
                    # d_pix: (P, 3) grid zyx -> world direction
                    d_w = d_pix[:, ::-1] @ jnp.asarray(minv.T)
                    d_w = d_w / jnp.maximum(
                        jnp.linalg.norm(d_w, axis=-1, keepdims=True),
                        1e-20,
                    )
                    at, *_ = _ns(
                        self.scene, self.fs, self.surf, self.cfg,
                        pos_w + n_w_eff * 1e-3, d_w,
                        jnp.full(p_, 1e-4, jnp.float32),
                        jnp.full(p_, 1.0, jnp.float32) * self.fs.ao_length,
                        include_contours=False, include_iso=False,
                        current_timestep=self.fs.tracer_timestep,
                        screen=(rw, rh),
                    )
                    return jnp.isfinite(at).astype(jnp.float32)

                key_ao = jax.random.fold_in(key, 7)
                if getattr(self, "ao_exact", False):
                    shadow = self._ao_shadow_exact(
                        pos_w, n_w_eff, key_ao, rw, rh
                    )
                else:
                    lat = self._ao_lattice_dev()
                    shadow = ao_shadow_fast(
                        lat, self.fs, pos_v[:, ::-1], n_vox_eff[:, ::-1],
                        key_ao, ao_samples=self.cfg.ao_samples,
                        geom_occluder=occ_geom, ao_dirs=self.cfg.ao_dirs,
                    )
                    shadow = jnp.where(
                        jnp.asarray(self.fs.ao_enabled), shadow, 0.0
                    )
                if self.cfg.gradient_shading_iso:
                    iso_shaded = jnp.where(
                        has_n[:, None],
                        iso_bg * (cosf * (1.0 - shadow))[:, None],
                        iso_bg,
                    )
                else:
                    iso_shaded = iso_bg
                geom_hit = t_sw_g < 1e9
                has_n_g = jnp.linalg.norm(n_w_g, axis=-1) > 0.0
                shade_g = amb_g[:, None] + base_g * (
                    jnp.abs((d_unit * n_w_g).sum(-1)) * (1.0 - shadow)
                )[:, None]
                bg_g = jnp.where(
                    geom_hit[:, None],
                    jnp.where(has_n_g[:, None], shade_g, base_g),
                    0.0,
                )
                bg = jnp.where(iso_wins[:, None], iso_shaded, bg_g)

        if clip:
            # clip box shrinks the volume interval only (clipRay,
            # exabrick.cu:1258-1264); surfaces render unclipped
            from .dvr import ray_box

            p = rw * rh
            t_end_w = (
                t_stop * rnorm if t_stop is not None
                else jnp.full(p, 2e10, jnp.float32)
            )
            chit, c0, c1 = ray_box(
                jnp.asarray(o_w), jnp.asarray(d_unit),
                jnp.asarray(self.fs.clip_lo), jnp.asarray(self.fs.clip_hi),
                jnp.zeros(p, jnp.float32), t_end_w,
            )
            t_start = jnp.where(chit, c0, jnp.inf) / rnorm
            t_stop = jnp.where(chit, c1, 0.0) / rnorm

        # TF-drag interactivity: repeated frame-0 renders at a stable
        # pose (accumulation resets on every TF edit, the pose and its
        # deterministic frame-0 jitter stay put) reuse the per-chunk
        # camera products and pay only the fused kernel — the analog of
        # the reference's updateXF -> lazy-BVH-rebuild -> render loop
        # (exa/OptixRenderer.cpp:370-404, 533-549).  Orbit frames (pose
        # changes) and accumulation frames (jitter changes) keep the
        # live path, so there is no prepare overhead when poses move.
        cam_cache = None
        try:
            pose = (
                np.asarray(cam.pos).tobytes(),
                np.asarray(cam.dir00).tobytes(),
                np.asarray(cam.dir_du).tobytes(),
                np.asarray(cam.dir_dv).tobytes(),
                rw, rh, id(grids.zranges),
                None if lattice is None else tuple(
                    np.asarray(l).tobytes() for l in lattice),
            )
        except Exception:
            pose = None
        if (pose is not None and int(self.fs.frame_id) == 0
                and pose == getattr(self, "_last_pose", None)
                and getattr(self, "_last_pose_grids", None)
                is grids.zranges):
            cam_cache = getattr(self, "_cam_cache", None)
            if cam_cache is None:
                cam_cache = self._cam_cache = {}
        self._last_pose = pose
        self._last_pose_grids = grids.zranges

        rgba = render_slabs_camera(
            grids, self.fs, scfg, cam, rw, rh, t_stop=t_stop,
            lattice=lattice, t_start=t_start, camera_cache=cam_cache,
        )
        color = composite_background(rgba, bg)
        if shear is not None:
            # surfaces and volume composited on intermediate rays; one
            # screen-space homography warp finishes the frame
            from .shearwarp import warp_image

            color = warp_image(
                color, shear, self.width, self.height,
                jx=0.5 + jx, jy=0.5 + jy, shift_i=kx, shift_j=ky,
            )
        self.accum, shown = accumulate(color, self.accum, self.fs.frame_id)
        return np.asarray(pack_rgba8(shown)).reshape(self.height, self.width)

    def _wavefront_pack(self):
        """Lazily build (and cache) the row-gather tables for the packed
        wavefront path; None when the config needs the classic sampler."""
        if not self.cfg.basis_method or self.cfg.gradient_shading_dvr:
            return None
        pack = getattr(self, "_pack", None)
        if pack is None:
            from .wavefront import build_pack

            try:
                pack = build_pack(
                    getattr(self, "_scene_host", self.scene),
                    self._grids_for(2),
                )
            except ValueError:
                pack = False  # scene exceeds packed-id range
            self._pack = pack
        return pack or None

    def _render_packed_compacted(self, pack) -> np.ndarray:
        """Wavefront frame through the binned/compacted integrator:
        same math as render_step_packed (bit-identical rgba), but the
        region-iteration tail runs on geometrically shrinking ray
        queues (trace_dvr_packed_compacted)."""
        from .dvr import ray_box
        from .wavefront import trace_dvr_packed_compacted

        w, h = self.width, self.height
        p = w * h
        fs = self.fs
        key = jax.random.fold_in(
            jax.random.PRNGKey(0x9E3779B9), fs.frame_id
        )
        jitter = jax.random.uniform(jax.random.fold_in(key, 1), (p, 2))
        offset = jax.random.uniform(jax.random.fold_in(key, 2), (p,))
        o, d = jax.jit(generate_rays, static_argnames=("width", "height"))(
            fs, w, h, jitter
        )
        fsurf = jax.jit(
            trace_surface_pass, static_argnames=("cfg", "screen")
        )
        t_hit, bg = fsurf(
            self.scene, fs, self.surf, self.cfg, o, d,
            jax.random.fold_in(key, 3), screen=(w, h),
        )
        chit, c0, c1 = ray_box(
            o, d, fs.clip_lo, fs.clip_hi, jnp.zeros(p), t_hit
        )
        t_start = jnp.where(
            fs.clip_enabled, jnp.where(chit, c0, jnp.inf), 0.0
        )
        t_end = jnp.where(fs.clip_enabled, jnp.where(chit, c1, 0.0), t_hit)
        rgba = trace_dvr_packed_compacted(
            pack, self.scene, fs, self.cfg, o, d, offset,
            t_end_world=t_end, t_start_world=t_start,
        )

        @jax.jit
        def finalize(rgba, bg, accum, frame_id):
            color = composite_background(rgba, bg)
            new_accum, shown = accumulate(color, accum, frame_id)
            return new_accum, pack_rgba8(shown)

        self.accum, rgba8_dev = finalize(rgba, bg, self.accum, fs.frame_id)
        return np.asarray(rgba8_dev).reshape(h, w)

    # -- frame ----------------------------------------------------------
    def render(self) -> np.ndarray:
        """Render one progressive frame; returns (H, W) uint32 RGBA8."""
        if getattr(self, "_fast", None) is not None:
            rgba8 = self._render_fast()
        else:
            pack = self._wavefront_pack()
            if pack is not None and self.cfg.wavefront_compaction:
                rgba8 = self._render_packed_compacted(pack)
                self.fs = dataclasses.replace(
                    self.fs, frame_id=self.fs.frame_id + 1
                )
                return rgba8
            if pack is not None:
                self.accum, rgba8_dev, _ = render_step_packed(
                    pack, self.scene, self.fs, self.surf, self.accum,
                    cfg=self.cfg, width=self.width, height=self.height,
                )
            else:
                self.accum, rgba8_dev, _ = render_step(
                    self.scene, self.fs, self.surf, self.accum,
                    cfg=self.cfg, width=self.width, height=self.height,
                )
            rgba8 = np.asarray(rgba8_dev).reshape(self.height, self.width)
        self.fs = dataclasses.replace(
            self.fs, frame_id=self.fs.frame_id + 1
        )
        return rgba8

    def render_frames(self, n: int) -> np.ndarray:
        out = None
        for _ in range(n):
            out = self.render()
        return out

    def image_uint8(self, rgba8: np.ndarray) -> np.ndarray:
        """(H, W) uint32 -> (H, W, 4) uint8, flipped to top-down for PNG."""
        img = rgba8.view(np.uint8).reshape(self.height, self.width, 4)
        return img[::-1]
