"""FaceDetector: the end-to-end detection + pose runtime.

Equivalent surface to the reference's blazeFaceDetector
(BlazePoser/blazeFaceDetectorH5.py:80-364), rebuilt as ONE fused XLA program:
preprocess (bicubic resize + normalize) → backbone + SSD + pose heads →
decode → NMS → pose gather all execute in a single jit, batched.  The
reference runs this as 5 host/TF round trips at batch 1 (~48.6 ms/frame CPU,
BASELINE.md); here a whole image batch stays on device end to end.

Use:
    det = FaceDetector.from_h5(".../reg1-stoqa9pt-reg2-hrchr82r-selected.h5")
    batch = det.detect(images)          # (B, H, W, 3) BGR uint8 → BatchResults
    results = batch.trim()              # ragged per-image, reference contract
    res = det.detect_single(image)      # one image → Results
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.anchors import AnchorConfig, BACK_CONFIG, FRONT_CONFIG, generate_anchors
from ..models.unified import UnifiedPoseModel, unified_from_h5
from ..ops.detection import MAX_FACES, postprocess
from ..ops.image import preprocess
from .results import BatchResults, Results

__all__ = ["FaceDetector"]


class FaceDetector:
    """Batched BlazeFace + head-pose detector on TPU.

    Parameters mirror the reference constructor (score/iou thresholds,
    blazeFaceDetectorH5.py:82); the model is a native UnifiedPoseModel
    (see models.unified) rather than an opaque H5 graph.
    """

    def __init__(self, model: UnifiedPoseModel, params: Any,
                 score_threshold: float = 0.4, iou_threshold: float = 0.3,
                 max_faces: int = MAX_FACES, input_size: int | None = None,
                 channel_order: str = "bgr", precision: str = "highest",
                 anchor_config: AnchorConfig | None = None,
                 turbo_island: tuple[int, ...] | None = None,
                 postprocess: str = "auto", head_eval: str = "auto",
                 mesh: Any | None = None, data_axis: str = "data"):
        self.model = model
        self.params = params
        # Multi-chip dp serving: pass the jax.sharding.Mesh the input batch
        # is sharded over (batch axis partitioned along `data_axis`).  The
        # backbone/decode stages partition under jit's auto-sharding on
        # their own (tests/test_parallel.py numeric parity); the fused
        # Pallas postprocess is an opaque custom call that auto-sharding
        # would replicate, so with a mesh it is wrapped in jax.shard_map —
        # each device runs the kernel on its local 128-lane shard.  Like
        # input_size/anchors this describes the serving topology and is
        # fixed at construction.  Global batch must divide by the mesh's
        # data-axis size.
        self.mesh = mesh
        self.data_axis = data_axis
        # optional override of the bf16 block island used by 'turbo'
        # (default: models.blazeface.turbo_fast_blocks — the corpus-certified
        # set); exposed for island-width probes (scripts/probe_turbo_island.py)
        self.turbo_island = tuple(turbo_island) if turbo_island is not None else None
        if input_size is None:
            # native models carry their resolution (128 front / 256 back);
            # graph-compiled adapters don't — default to the front camera
            spec = getattr(model, "backbone", None)
            input_size = spec.input_size if spec is not None else 128
        self.score_threshold = float(score_threshold)
        self.iou_threshold = float(iou_threshold)
        self.max_faces = int(max_faces)
        self.input_size = int(input_size)
        if channel_order not in ("bgr", "rgb"):
            raise ValueError(f"channel_order must be 'bgr' or 'rgb', "
                             f"got {channel_order!r}")
        self.channel_order = channel_order
        # 'highest' pins exact-f32 matmuls/convs — on TPU the default bf16
        # passes cost ~20 degrees on pose maps (errors compound through the
        # un-normalized conv stack), blowing the 0.1-degree parity budget
        # (BASELINE.md).  All modes are certified on the 112-image /
        # 451-detection parity corpus (docs/certification.json,
        # scripts/certify_modes.py):
        #   'highest'  exact f32; pose err p99 0.0012 deg, max 0.0015.
        #   'fast'     dense-composed 3x3 convs at 3-pass 'high': pose err
        #              p99 0.0039 / max 0.0064 deg, identical detection
        #              sets — the FASTEST PARITY-CERTIFIED mode (~70%
        #              faster than 'highest').
        #   'turbo'    'fast' + trailing blocks and SSD heads at
        #              single-pass bf16: p99 0.22 / max 4.2 deg — OUTSIDE
        #              the strict parity budget (the round-2 "0.07 deg"
        #              label was a 3-image max; the corpus p99 killed it,
        #              and the island probes show NO bf16 backbone island
        #              holds p99 < 0.1 — docs/turbo_island_probe.json).
        #              Detection sets identical on the primary corpus but
        #              101/108 on boundary-stress images, and truncation
        #              order at the 100-face cap never matches (stress
        #              section of docs/certification.json); fine for
        #              accuracy-driven serving (heads' own MAE is 4-8 deg).
        #   'max'      every block at single-pass bf16: p99 0.68 / max 4.9
        #              deg, 4/112 images change detection sets; fastest.
        # Postprocess selection stays at HIGHEST in every mode.
        self.precision = precision
        # postprocess backend: 'xla' (ops.detection.postprocess, batched
        # lax.while_loop NMS + one-hot-GEMM extraction), 'pallas' (the
        # fused single-kernel NMS of ops/pallas/postprocess.py — bit-exact
        # vs 'xla' by construction, tests/test_pallas.py), or 'auto' (the
        # default; per-chunk: the fused kernel on TPU at >=64-lane
        # occupancy, XLA for small batches and off-TPU — the kernel
        # processes a full 128-lane tile regardless of occupancy; measured
        # crossover guidance in docs/BENCH.md)
        if postprocess not in ("xla", "pallas", "auto"):
            raise ValueError(f"postprocess must be 'xla', 'pallas' or "
                             f"'auto', got {postprocess!r}")
        self.postprocess = postprocess
        # head evaluation profile:
        #   'map'       — the reference's grafted-graph semantics
        #               (JoinModels.py:65-66): pose heads run over EVERY
        #               cell of both feature maps before NMS, poses gathered
        #               per survivor.  The parity-certified path.
        #   'survivors' — heads run AFTER NMS, on the feature vectors
        #               gathered at the survivor cells only (≤ max_faces
        #               rows instead of 320 map cells).  For per-cell head
        #               families (every 1x1-conv chain: mlp/residual/skip —
        #               all shipped reference heads) the poses are
        #               numerically identical to 'map' (measured bit-exact
        #               on-chip, docs/headeval_divergence.json); for heads
        #               with SPATIAL context (SE gating's map-wide pooling,
        #               the SE-Transformer's token attention) each face's
        #               vector is evaluated independently — the
        #               TRAINING/dataset semantics (SURVEY.md §2.15: one
        #               feature vector per face), which is what
        #               stacked-ensemble calibration
        #               (scripts/stack_ensemble.py) optimized: map-grafting
        #               unified-best's SE-gated stacks diverges p50 3.9 /
        #               max 26.5 deg from the calibrated function.  Needs a
        #               native model exposing both heads + feature taps
        #               (from_h5/from_native; not from_h5_compat).
        #   'auto'      (default) — 'survivors' exactly when a head
        #               declares spatial_context=True (so per-cell models —
        #               every reference artifact — keep the bit-identical
        #               'map' program, and ensemble artifacts with SE
        #               members serve their calibrated semantics without
        #               the caller knowing the flag).  Protocol heads
        #               WITHOUT the attribute resolve to 'map' (reference
        #               semantics preserved for arbitrary user heads).
        if head_eval not in ("map", "survivors", "auto"):
            raise ValueError(f"head_eval must be 'map', 'survivors' or "
                             f"'auto', got {head_eval!r}")
        h88 = getattr(model, "head88", None)
        h96 = getattr(model, "head96", None)
        if head_eval == "auto":
            spatial = any(getattr(h, "spatial_context", False)
                          for h in (h88, h96) if h is not None)
            head_eval = ("survivors" if spatial and h88 is not None
                         and h96 is not None else "map")
        if head_eval == "survivors" and (h88 is None or h96 is None):
            raise ValueError(
                "head_eval='survivors' needs a native UnifiedPoseModel with "
                "both pose heads attached (graph-compiled models expose "
                "neither the heads nor the feature-map taps) — load through "
                "from_h5/from_native, or use head_eval='map'")
        self.head_eval = head_eval
        # anchors follow the model's input resolution: 128 → front-camera
        # config (blazeFaceDetectorH5.py:236-241), 256 → the back-camera
        # config the reference reserves but never wires (INPUT_BACK=256)
        if anchor_config is None:
            anchor_config = BACK_CONFIG if self.input_size == 256 else FRONT_CONFIG
        self.anchors = jnp.asarray(generate_anchors(anchor_config), jnp.float32)

    @classmethod
    def from_h5(cls, path: str, **kwargs) -> "FaceDetector":
        model, params = unified_from_h5(path)
        return cls(model, params, **kwargs)

    @classmethod
    def from_h5_compat(cls, path: str, **kwargs) -> "FaceDetector":
        """Load ANY reference-format unified H5 through the graph compiler —
        works even when the grafted pose heads are not plain 1x1-conv chains
        (SE-transformer variants etc.), at the cost of the compat layer's
        generic execution."""
        from ..core.graph import load_graph_model

        gm = load_graph_model(path)
        return cls(_GraphUnifiedAdapter(gm), gm.params, **kwargs)

    @classmethod
    def from_native(cls, path: str, **kwargs) -> "FaceDetector":
        """Load a native model directory saved by tools.export.save_model
        (e.g. the output of tools.join_cli)."""
        from ..tools.export import load_model

        model, params = load_model(path)
        return cls(model, params, **kwargs)

    # ------------------------------------------------------------- pipeline
    # serving batches wider than one 128-lane tile pay a hard 2x wall-time
    # step per extra tile AND tile worse than sequential 128-wide programs
    # (batch 512 native: 8.21 ms vs 6.17 ms as four explicit 128-wide
    # branches — docs/BENCH.md "the >128 cliff").  _pipeline therefore
    # splits wide batches into <=128-image branches INSIDE the one jit.
    CHUNK = 128

    @functools.cached_property
    def _pipeline(self):
        # per-INSTANCE jit (not a class-level static-self decoration): a
        # class-level wrapper would key the process-global jit cache on
        # `self`, pinning every detector ever used — and its full params
        # pytree — for the life of the process.  The cached_property's
        # compiled programs die with the instance.
        return jax.jit(self._pipeline_dispatch,
                       static_argnums=(2, 3, 4, 5, 6, 7, 8))

    def _pipeline_dispatch(self, params, images, score_threshold,
                           iou_threshold, max_faces, precision,
                           postprocess_backend="xla", turbo_island=None,
                           head_eval="map"):
        b = images.shape[0]
        # the 128-lane cliff is per DEVICE: under a dp mesh each device
        # holds b/n of the batch, so one chunk covers CHUNK lanes per shard
        chunk = self.CHUNK * (self.mesh.shape[self.data_axis]
                              if self.mesh is not None else 1)
        if b <= chunk:
            return self._pipeline_body(params, images, score_threshold,
                                       iou_threshold, max_faces, precision,
                                       postprocess_backend, turbo_island,
                                       head_eval)
        posts = [self._pipeline_body(params, images[i:i + chunk],
                                     score_threshold, iou_threshold,
                                     max_faces, precision,
                                     postprocess_backend, turbo_island,
                                     head_eval)
                 for i in range(0, b, chunk)]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *posts)

    def _pipeline_body(self, params, images, score_threshold, iou_threshold,
                       max_faces, precision, postprocess_backend="xla",
                       turbo_island=None, head_eval="map"):
        """(B, H, W, 3) raw frames → padded detection slabs.  One XLA program.

        The threshold/precision config enters as STATIC jit arguments (not
        read off `self` at trace time) so that mutating detector attributes
        between calls correctly retraces instead of silently reusing the
        program compiled for the old values.  Only score/iou thresholds,
        max_faces, precision, postprocess, turbo_island, and head_eval are
        mutation-safe this way: input_size,
        channel_order, and the anchor table are fixed at construction (they
        describe the model, not the serving config) — rebuild the detector
        to change them."""
        from ..models.blazeface import turbo_fast_blocks

        fast = precision in ("fast", "turbo", "max")
        # graph-compiled adapters (from_h5_compat) expose no backbone spec
        # and take no dense/fast_blocks kwargs, so the accelerated modes
        # cannot apply — fail loudly instead of silently serving a
        # different (slower, ambient-precision) configuration
        spec = getattr(self.model, "backbone", None)
        if fast and spec is None:
            raise ValueError(
                f"precision={precision!r} needs a native backbone spec "
                "(dense composition + bf16 precision islands); this model "
                "was graph-compiled (from_h5_compat) and exposes none. "
                "Use precision='highest', or load through from_h5/"
                "from_native for the accelerated modes.")
        kwargs = {"dense": True} if fast and spec is not None else {}
        if spec is not None:
            if precision == "turbo":
                kwargs["fast_blocks"] = (turbo_island if turbo_island
                                         is not None else turbo_fast_blocks(spec))
            elif precision == "max":
                kwargs["fast_blocks"] = tuple(range(len(spec.block_channels)))
        with jax.default_matmul_precision("high" if fast else precision):
            x = preprocess(images, self.input_size, self.channel_order)
            out = self.model.apply(params, x, heads=head_eval == "map",
                                   **kwargs)
        if head_eval == "survivors":
            # re-validate here, not only in __init__: head_eval is a
            # mutation-safe static arg, so a post-construction
            # `det.head_eval = 'survivors'` on a graph-compiled model must
            # fail with THIS message, not a KeyError mid-trace
            if (getattr(self.model, "head88", None) is None
                    or getattr(self.model, "head96", None) is None
                    or "feat88" not in out or "feat96" not in out):
                raise ValueError(
                    "head_eval='survivors' needs a native UnifiedPoseModel "
                    "with both pose heads and feature-map taps (feat88/"
                    "feat96) — graph-compiled models (from_h5_compat) "
                    "expose neither; use head_eval='map'")
            # the postprocess extracts its 3 "pose" channels per survivor
            # with exact arithmetic in BOTH backends, so cell-index-encoded
            # maps ride the existing contract: channel 0 comes back as each
            # survivor's flat cell index (ops.detection.cell_index_maps)
            from ..ops.detection import cell_index_maps

            pose_front, pose_back = cell_index_maps(out["feat88"],
                                                    out["feat96"])
        else:
            pose_front, pose_back = out["pose_front"], out["pose_back"]
        n_shards = (self.mesh.shape[self.data_axis]
                    if self.mesh is not None else 1)
        # the platform the postprocess actually RUNS on: with a mesh it is
        # the mesh's devices, which can differ from the process default
        # backend (this container keeps a TPU default even when the caller
        # builds a forced-CPU virtual mesh — dryrun_multichip's mode)
        platform = (self.mesh.devices.flat[0].platform
                    if self.mesh is not None else jax.default_backend())
        if postprocess_backend == "auto":
            # the kernel pays for its full 128-lane tile only when enough
            # lanes are occupied: measured win at batch >= 64, loss at 1
            # (docs/BENCH.md); 64 is the lowest measured win point —
            # counted PER DEVICE under a dp mesh.  Off-TPU the kernel runs
            # in interpret mode (slow).  Without a mesh, multi-chip hosts
            # keep XLA (the opaque Mosaic call would force replication
            # under auto-sharding); with a mesh the shard_map wrapper below
            # makes the kernel partitionable, so 'auto' may take it.
            single = self.mesh is None and jax.device_count() == 1
            postprocess_backend = (
                "pallas" if images.shape[0] // n_shards >= 64
                and platform == "tpu"
                and (single or n_shards > 1) else "xla")
        if postprocess_backend == "pallas":
            from ..ops.pallas.postprocess import postprocess_pallas

            def pallas_call(scores, loc, pose_front, pose_back):
                return postprocess_pallas(
                    scores, loc, pose_front, pose_back, self.anchors,
                    score_threshold=score_threshold,
                    iou_threshold=iou_threshold,
                    input_size=self.input_size, max_faces=max_faces,
                    interpret=platform == "cpu")

            if n_shards > 1:
                # dp serving: run the kernel per device on its local shard
                # (auto-sharding cannot partition an opaque custom call)
                from jax.sharding import PartitionSpec as P

                spec = P(self.data_axis)
                # check_vma=False: pallas_call's out_shape carries no vma
                # annotation, which the varying-mesh-axes checker requires
                pallas_call = jax.shard_map(
                    pallas_call, mesh=self.mesh,
                    in_specs=(spec,) * 4, out_specs=spec,
                    check_vma=False)
            post = pallas_call(out["scores"], out["loc"],
                               pose_front, pose_back)
        else:
            post = jax.vmap(
                lambda s, l, pf, pb: postprocess(
                    s, l, pf, pb, self.anchors,
                    score_threshold=score_threshold,
                    iou_threshold=iou_threshold,
                    input_size=self.input_size,
                    max_faces=max_faces))(
                out["scores"], out["loc"], pose_front, pose_back)
        if head_eval == "survivors":
            post = dict(post)
            post["poses"] = self._survivor_poses(params, out, post, precision)
        return post

    def _survivor_poses(self, params, out, post, precision):
        """head_eval='survivors': run the pose heads on the feature vectors
        gathered at the NMS-survivor cells (≤ max_faces rows) instead of
        over every map cell.  Heads see 2-D (rows, C) input — each face's
        vector evaluated independently, the training/dataset semantics
        (identical to 'map' for per-cell families; see __init__)."""
        from ..ops.detection import gather_survivor_features

        cells = jnp.round(post["poses"][..., 0]).astype(jnp.int32)   # (B, F)
        vf, vb, is_front = gather_survivor_features(
            cells, post["valid"], out["feat88"], out["feat96"])
        B, F = cells.shape
        # same ambient precision the 'map' path evaluates heads under
        fast = precision in ("fast", "turbo", "max")
        with jax.default_matmul_precision("high" if fast else precision):
            pf = self.model.head88.apply(
                params["head88"], vf.reshape(B * F, -1)).reshape(B, F, 3)
            pb = self.model.head96.apply(
                params["head96"], vb.reshape(B * F, -1)).reshape(B, F, 3)
        z = post["valid"][..., None]
        return jnp.where(is_front[..., None] & z, pf,
                         jnp.where(z, pb, 0.0))

    @property
    def batch_granularity(self) -> int:
        """Every detect() batch must be a multiple of this (1 without a
        mesh; the data-axis size with one — dp serving shards the batch
        evenly).  Batching front ends (runtime.server.DynamicBatcher) build
        their pad ladder on it so every dispatch width is servable."""
        return (int(self.mesh.shape[self.data_axis])
                if self.mesh is not None else 1)

    def detect(self, images) -> BatchResults:
        """images: (B, H, W, 3) or (H, W, 3), uint8/float 0-255, BGR by default."""
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if self.mesh is not None:
            n = self.mesh.shape[self.data_axis]
            if images.shape[0] % n:
                raise ValueError(
                    f"batch {images.shape[0]} does not divide over the "
                    f"{n}-way '{self.data_axis}' mesh axis — dp serving "
                    "shards the batch evenly (pad the batch or drop the "
                    "mesh)")
        post = self._pipeline(self.params, images, self.score_threshold,
                              self.iou_threshold, self.max_faces,
                              self.precision, self.postprocess,
                              self.turbo_island, self.head_eval)
        return BatchResults(boxes=post["boxes"], keypoints=post["keypoints"],
                            scores=post["scores"], poses=post["poses"],
                            valid=post["valid"])

    def detect_single(self, image) -> Results:
        return self.detect(image).trim()[0]

    def warmup(self, shape: tuple[int, ...] = (1, 480, 480, 3)) -> None:
        """Trigger compilation for a given input shape."""
        self.detect(np.zeros(shape, np.uint8))


class _GraphUnifiedAdapter:
    """Adapts a compiled 6-output unified GraphModel (core.graph) to the
    UnifiedPoseModel apply contract (dict with scores/loc/pose maps)."""

    def __init__(self, graph_model):
        self._gm = graph_model

    def apply(self, params, x, **_):
        cls_f, cls_b, loc_f, loc_b, pose_f, pose_b = self._gm.apply(params, x)
        B = x.shape[0]
        return {
            "scores": jnp.concatenate(
                [cls_f.reshape(B, -1), cls_b.reshape(B, -1)], axis=1),
            "loc": jnp.concatenate(
                [loc_f.reshape(B, -1, 16), loc_b.reshape(B, -1, 16)], axis=1),
            "pose_front": pose_f,
            "pose_back": pose_b,
        }
