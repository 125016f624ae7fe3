"""Command-line interface: `python -m colmap_pcd_tpu <command> [--flags]`.

Parity with src/exe/colmap.cc:93-150 — the subcommand registry. Flags use the
reference's namespaced names (--Mapper.init_image_x, --SiftExtraction.*, ...,
utils/config.py). Commands not meaningful for a headless TPU build (gui,
CUDA-specific toggles) print an explanation instead of failing cryptically.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .utils.config import OptionManager


def _opt(argv):
    om = OptionManager()
    rest = om.parse_args(argv)
    if om.database_path == "" and "--project_path" in argv:
        pass
    return om, rest


def cmd_feature_extractor(argv):
    om, _ = _opt(argv)
    from .models.feature_pipeline import ImageReaderConfig, run_feature_extractor

    reader = ImageReaderConfig(
        camera_model=om.image_reader.camera_model,
        single_camera=om.image_reader.single_camera,
        camera_params=om.image_reader.camera_params,
        default_focal_factor=om.image_reader.default_focal_length_factor,
    )
    n = run_feature_extractor(om.database_path, om.image_path, om.sift_extraction, reader)
    print(f"Extracted features for {n} images")
    return 0


def cmd_exhaustive_matcher(argv):
    om, _ = _opt(argv)
    from .models.feature_pipeline import run_exhaustive_matcher

    n = run_exhaustive_matcher(om.database_path, om.sift_matching)
    print(f"Verified {n} image pairs")
    return 0


def cmd_sequential_matcher(argv):
    om, rest = _opt([a for a in argv if not a.startswith("--Sequential")])
    overlap = 10
    loop = False
    rerank = False
    it = iter(argv)
    for a in it:
        if a == "--SequentialMatching.overlap":
            overlap = int(next(it))
        if a == "--SequentialMatching.loop_detection":
            loop = next(it).lower() in ("1", "true")
        if a == "--SequentialMatching.spatial_rerank":
            rerank = next(it).lower() in ("1", "true")
    from .models.feature_pipeline import run_sequential_matcher

    n = run_sequential_matcher(om.database_path, om.sift_matching, overlap=overlap,
                               loop_detection=loop, loop_spatial_rerank=rerank)
    print(f"Verified {n} image pairs")
    return 0


def cmd_transitive_matcher(argv):
    om, _ = _opt(argv)
    from .models.feature_pipeline import run_transitive_matcher

    n = run_transitive_matcher(om.database_path, om.sift_matching)
    print(f"Verified {n} transitive pairs")
    return 0


def cmd_vocab_tree_matcher(argv):
    om, _ = _opt([a for a in argv if not a.startswith("--VocabTreeMatching")])
    rerank = False
    num_images = 100
    it = iter(argv)
    for a in it:
        if a == "--VocabTreeMatching.num_images":
            num_images = int(next(it))
        if a == "--VocabTreeMatching.spatial_rerank":
            # vote-and-verify re-ranking of the retrieval shortlist
            # (retrieval/vote_and_verify.cc analog)
            rerank = next(it).lower() in ("1", "true")
    from .models.feature_pipeline import run_vocab_tree_matcher

    n = run_vocab_tree_matcher(om.database_path, om.sift_matching,
                               num_images=num_images, spatial_rerank=rerank)
    print(f"Verified {n} retrieved pairs")
    return 0


def cmd_spatial_matcher(argv):
    """GPS/position-prior neighbor matching. Locations come either from a
    text file (--location_path: 'name lat lon alt' or 'name x y z') or a
    pose.ply prior (--Mapper.image_pose_prior_path)."""
    location_path = None
    is_gps = False
    filtered = []
    it = iter(argv)
    for a in it:
        if a == "--location_path":
            location_path = next(it)
        elif a == "--SpatialMatching.is_gps":
            is_gps = next(it).lower() in ("1", "true")
        else:
            filtered.append(a)
    om, _ = _opt(filtered)
    from .models.database import Database
    from .models.feature_pipeline import run_spatial_matcher

    db = Database(om.database_path)
    by_name = {v["name"]: k for k, v in db.images().items()}
    db.close()
    locations = {}
    rows = []
    with open(location_path) as f:
        for line in f:
            tok = line.split()
            if len(tok) >= 4 and tok[0] in by_name:
                rows.append((by_name[tok[0]], [float(x) for x in tok[1:4]]))
    if is_gps and rows:
        from .utils.gps import lla_to_enu

        lat0, lon0, alt0 = rows[0][1]
        for iid, (lat, lon, alt) in rows:
            locations[iid] = lla_to_enu(lat, lon, alt, lat0, lon0, alt0)
    else:
        for iid, xyz in rows:
            locations[iid] = np.asarray(xyz)
    n = run_spatial_matcher(om.database_path, locations, om.sift_matching)
    print(f"Verified {n} spatial pairs")
    return 0


def cmd_vocab_tree_builder(argv):
    """Build and save a retrieval vocabulary (VLAD kmeans centroids) from the
    database's descriptors (RunVocabTreeBuilder analog)."""
    p = _paths(argv, "database_path", "vocab_tree_path")
    import jax

    from .models.database import Database
    from .ops import retrieval

    db = Database(p["database_path"])
    descs = {i: db.read_descriptors(i).astype(np.float32) for i in db.images()}
    db.close()
    index = retrieval.build_index(descs)
    np.savez(p["vocab_tree_path"], centroids=index.centroids)
    print(f"Saved vocabulary ({index.centroids.shape[0]} words) to {p['vocab_tree_path']}")
    return 0


def cmd_vocab_tree_retriever(argv):
    """Rank database images against each query image (RunVocabTreeRetriever)."""
    p = _paths(argv, "database_path", "num_images")
    from .models.database import Database
    from .ops import retrieval

    db = Database(p["database_path"])
    descs = {i: db.read_descriptors(i).astype(np.float32) for i in db.images()}
    names = {i: v["name"] for i, v in db.images().items()}
    db.close()
    index = retrieval.build_index(descs)
    k = int(p["num_images"] or 10)
    for i in sorted(descs):
        ranked = retrieval.query(index, i, k)
        print(f"{names[i]}: " + ", ".join(names[j] for j in ranked))
    return 0


def cmd_matches_importer(argv):
    match_list = None
    match_type = "pairs"
    it = iter(argv)
    filtered = []
    for a in it:
        if a == "--match_list_path":
            match_list = next(it)
        elif a == "--match_type":
            match_type = next(it)  # pairs | raw | inliers
        else:
            filtered.append(a)
    om, _ = _opt(filtered)
    if match_type in ("raw", "inliers"):
        from .models.feature_pipeline import run_feature_pairs_importer

        n = run_feature_pairs_importer(
            om.database_path, match_list, om.sift_matching, verify=match_type == "raw"
        )
        print(f"Imported {n} feature-pair blocks")
        return 0
    pairs = []
    with open(match_list) as f:
        for line in f:
            tok = line.split()
            if len(tok) >= 2:
                pairs.append((tok[0], tok[1]))
    from .models.feature_pipeline import run_image_pairs_matcher

    n = run_image_pairs_matcher(om.database_path, pairs, om.sift_matching)
    print(f"Verified {n} imported pairs")
    return 0


def _load_mapper_inputs(om, input_path=None):
    """Database -> Reconstruction skeleton + CorrespondenceGraph (+ lidar map,
    pose priors): the DatabaseCache load step."""
    from .models.correspondence_graph import CorrespondenceGraph
    from .models.database import Database
    from .models.lidar_map import LidarMap
    from .models.reconstruction import Camera, Image, Reconstruction, load_image_poses
    from .ops.pointcloud import ProjOptions

    db = Database(om.database_path)
    rec = Reconstruction() if input_path in (None, "") else Reconstruction.read(input_path)
    for cid, c in db.cameras().items():
        rec.add_camera(
            Camera(
                cid, c["model_id"], c["width"], c["height"], c["params"],
                prior_focal=bool(c.get("prior_focal", False)),
            )
        )
    for iid, im in sorted(db.images().items()):
        kp = db.read_keypoints(iid)
        if iid in rec.images:
            continue
        rec.add_image(Image(iid, im["name"], im["camera_id"], xys=kp[:, :2].astype(np.float64)))
    graph = CorrespondenceGraph()
    min_matches = om.mapper.min_num_matches
    for i, j in db.all_two_view_pair_ids():
        g = db.read_two_view_geometry(i, j)
        if g is not None and len(g["inlier_matches"]) >= min_matches:
            graph.add_matches(i, j, g["inlier_matches"].astype(np.int32))
    db.close()

    lmap = None
    if om.mapper.if_add_lidar_constraint and om.mapper.lidar_pointcloud_path:
        lmap = LidarMap.load(
            om.mapper.lidar_pointcloud_path,
            ProjOptions(
                depth_image_scale=om.mapper.depth_image_scale,
                max_proj_scale=om.mapper.max_proj_scale,
                min_proj_scale=om.mapper.min_proj_scale,
                min_proj_dist=om.mapper.min_proj_dist,
                choose_meter=om.mapper.choose_meter,
                min_lidar_proj_dist=om.mapper.min_lidar_proj_dist,
                submap_cell=om.mapper.submap_length,
            ),
        )
    priors = {}
    if om.mapper.if_import_pose_prior and om.mapper.image_pose_prior_path:
        priors = load_image_poses(om.mapper.image_pose_prior_path)
    return rec, graph, lmap, priors


def _mapper_options(om):
    from .models.incremental_mapper import MapperOptions

    m = om.mapper
    return MapperOptions(
        if_add_lidar_constraint=m.if_add_lidar_constraint and bool(m.lidar_pointcloud_path),
        if_add_lidar_corresponding=m.if_add_lidar_corresponding,
        first_image_fixed_frames=m.first_image_fixed_frames,
        min_proj_num=m.min_proj_num,
        kdtree_max_search_range=m.kdtree_max_search_range,
        kdtree_min_search_range=m.kdtree_min_search_range,
        search_range_drop_speed=m.search_range_drop_speed,
        ba_spherical_search_radius=m.ba_spherical_search_radius,
        ba_match_features_threshold=m.ba_match_features_threshold,
        proj_lidar_constraint_weight=m.proj_lidar_constraint_weight,
        icp_lidar_constraint_weight=m.icp_lidar_constraint_weight,
        icp_ground_lidar_constraint_weight=m.icp_ground_lidar_constraint_weight,
        proj_max_dist_error=m.proj_max_dist_error,
        icp_max_dist_error=m.icp_max_dist_error,
        init_image_id1=m.init_image_id1,
        init_image_id2=m.init_image_id2,
        init_image_x=m.init_image_x,
        init_image_y=m.init_image_y,
        init_image_z=m.init_image_z,
        init_image_roll=m.init_image_roll,
        init_image_pitch=m.init_image_pitch,
        init_image_yaw=m.init_image_yaw,
        init_min_num_inliers=m.init_min_num_inliers,
        init_max_error=m.init_max_error,
        init_min_tri_angle=m.init_min_tri_angle,
        init_max_forward_motion=m.init_max_forward_motion,
        init_max_reg_trials=m.init_max_reg_trials,
        abs_pose_max_error=m.abs_pose_max_error,
        abs_pose_min_num_inliers=m.abs_pose_min_num_inliers,
        abs_pose_min_inlier_ratio=m.abs_pose_min_inlier_ratio,
        max_reg_trials=m.max_reg_trials,
        local_ba_num_images=m.local_ba_num_images,
        filter_max_reproj_error=m.filter_max_reproj_error,
        filter_min_tri_angle=m.filter_min_tri_angle,
    )


def cmd_mapper(argv):
    input_path, output_path = None, None
    filtered = []
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        else:
            filtered.append(a)
    om, _ = _opt(filtered)
    from .models.controllers import ControllerOptions, IncrementalMapperController
    from .utils import prewarm

    prewarm.replay()  # overlap shape-ladder compiles with DB loading
    rec, graph, lmap, priors = _load_mapper_inputs(om, input_path)
    copts = ControllerOptions(
        min_num_matches=om.mapper.min_num_matches,
        multiple_models=om.mapper.multiple_models,
        max_num_models=om.mapper.max_num_models,
        max_model_overlap=om.mapper.max_model_overlap,
        min_model_size=om.mapper.min_model_size,
        init_num_trials=om.mapper.init_num_trials,
        snapshot_path=om.mapper.snapshot_path,
        snapshot_images_freq=om.mapper.snapshot_images_freq,
        image_pose_save_folder=om.mapper.image_pose_save_folder,
        image_path=om.image_path,
    )
    ctl = IncrementalMapperController(
        rec, graph, _mapper_options(om), copts, lidar_map=lmap, pose_priors=priors
    )
    manager = ctl.run()
    prewarm.save()
    if output_path:
        manager.write(output_path)
        print(f"Wrote {manager.size()} model(s) to {output_path}")
    return 0 if manager.size() > 0 else 1


def cmd_hierarchical_mapper(argv):
    """Cluster the scene, reconstruct leaves, merge (RunHierarchicalMapper,
    exe/colmap.cc:93-150; controllers/hierarchical_mapper.h:47)."""
    output_path, leaf_max_num_images, image_overlap = None, 500, 50
    filtered = []
    it = iter(argv)
    for a in it:
        if a == "--output_path":
            output_path = next(it)
        elif a == "--leaf_max_num_images":
            leaf_max_num_images = int(next(it))
        elif a == "--image_overlap":
            image_overlap = int(next(it))
        else:
            filtered.append(a)
    om, _ = _opt(filtered)
    from .models.controllers import ControllerOptions
    from .models.hierarchical import SceneClusteringOptions, run_hierarchical_mapper

    rec, graph, lmap, priors = _load_mapper_inputs(om)
    clustering = SceneClusteringOptions(
        leaf_max_num_images=leaf_max_num_images, image_overlap=image_overlap
    )
    merged = run_hierarchical_mapper(
        rec,
        graph,
        _mapper_options(om),
        clustering=clustering,
        lidar_map=lmap,
        pose_priors=priors,
        controller_options=ControllerOptions(
            min_num_matches=om.mapper.min_num_matches,
            min_model_size=om.mapper.min_model_size,
        ),
    )
    ok = merged.num_reg_images >= 2
    if output_path:
        out = os.path.join(output_path, "0")
        merged.write(out)
        print(f"Wrote merged model to {out}")
    return 0 if ok else 1


def cmd_point_triangulator(argv):
    """Triangulate points against fixed known poses (RunPointTriangulator)."""
    input_path, output_path = None, None
    filtered = []
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        else:
            filtered.append(a)
    om, _ = _opt(filtered)
    from .models.triangulator import IncrementalTriangulator, TriangulatorOptions

    rec, graph, lmap, priors = _load_mapper_inputs(om, input_path)
    tri = IncrementalTriangulator(rec, graph)
    topts = TriangulatorOptions()
    n = 0
    for iid in rec.registered_ids:
        n += tri.triangulate_image(topts, iid)
    tri.complete_tracks(topts, list(rec.points3D.keys()))
    tri.merge_tracks(topts, list(rec.points3D.keys()))
    if output_path:
        rec.write(output_path)
    print(f"Triangulated {n} observations, {len(rec.points3D)} points")
    return 0


def cmd_bundle_adjuster(argv):
    input_path, output_path = None, None
    filtered = []
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        else:
            filtered.append(a)
    om, _ = _opt(filtered)
    from .models.controllers import BundleAdjustmentController
    from .models.lidar_map import LidarMap
    from .models.reconstruction import Reconstruction

    rec = Reconstruction.read(input_path)
    lmap = None
    if om.bundle_adjustment.if_add_lidar_constraint and om.mapper.lidar_pointcloud_path:
        lmap = LidarMap.load(om.mapper.lidar_pointcloud_path)
    mo = _mapper_options(om)
    mo.proj_lidar_constraint_weight = om.bundle_adjustment.proj_lidar_constraint_weight
    mo.icp_lidar_constraint_weight = om.bundle_adjustment.icp_lidar_constraint_weight
    mo.icp_ground_lidar_constraint_weight = om.bundle_adjustment.icp_ground_lidar_constraint_weight
    ctl = BundleAdjustmentController(
        rec, mo, lidar_map=lmap, refine_intrinsics=om.bundle_adjustment.refine_focal_length
    )
    ok = ctl.run()
    if output_path:
        rec.write(output_path)
    print(f"Bundle adjustment {'succeeded' if ok else 'failed'}; "
          f"mean reprojection error {rec.mean_reprojection_error():.3f}px")
    return 0 if ok else 1


def cmd_rig_bundle_adjuster(argv):
    """Rig-constrained bundle adjustment (reference: src/exe/sfm.cc
    RunRigBundleAdjuster): image poses are re-composed from per-snapshot rig
    poses and per-rig-camera relative poses, then jointly optimized."""
    input_path = output_path = rig_config_path = None
    refine_rel = True
    estimate_rig = False
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        elif a == "--rig_config_path":
            rig_config_path = next(it)
        elif a == "--RigBundleAdjustment.refine_relative_poses":
            refine_rel = next(it) in ("1", "true", "True")
        elif a == "--estimate_rig_poses_from_images":
            estimate_rig = next(it) in ("1", "true", "True")
    if not (input_path and output_path and rig_config_path):
        print("usage: rig_bundle_adjuster --input_path M --output_path O "
              "--rig_config_path rig.json [--RigBundleAdjustment.refine_relative_poses 0|1]")
        return 1
    from .models.camera_rig import read_rig_config
    from .models.reconstruction import Reconstruction
    from .models.rig_adjuster import RigBAOptions, RigBundleAdjuster

    rec = Reconstruction.read(input_path)
    rigs = read_rig_config(rig_config_path, rec)
    if estimate_rig:
        for rig in rigs:
            rig.compute_relative_poses(rec)
    for i, rig in enumerate(rigs):
        print(f"rig {i}: {rig.num_cameras()} cameras, {rig.num_snapshots()} snapshots")
    adj = RigBundleAdjuster(RigBAOptions(refine_relative_poses=refine_rel))
    ok = adj.solve(rec, rigs)
    if ok:
        print(f"rig BA: cost {adj.initial_cost:.4g} -> {adj.final_cost:.4g} "
              f"in {adj.iterations} iterations")
        rec.write(output_path)
    else:
        print("rig BA failed")
    return 0 if ok else 1


def cmd_model_converter(argv):
    """BIN/TXT/PLY/NVM/BUNDLER/CAM/VRML export, NVM import (RunModelConverter,
    exe/model.cc:560-612 output_type dispatch). An `--input_path *.nvm` file
    imports VisualSFM models."""
    input_path = output_path = None
    output_type = "BIN"
    skip_distortion = False
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        elif a == "--output_type":
            output_type = next(it).upper()
        elif a == "--skip_distortion":
            skip_distortion = next(it) not in ("0", "false", "False")
    from .io import model_formats, ply as ply_io
    from .models.reconstruction import Reconstruction

    if input_path.lower().endswith(".nvm"):
        rec = model_formats.import_nvm(input_path)
    else:
        rec = Reconstruction.read(input_path)
    if output_type in ("BIN", "TXT"):
        rec.write(output_path, binary=output_type == "BIN")
    elif output_type == "PLY":
        pts = np.stack([p.xyz for p in rec.points3D.values()]) if rec.points3D else np.zeros((0, 3))
        cols = np.stack([p.color for p in rec.points3D.values()]) if rec.points3D else np.zeros((0, 3), np.uint8)
        ply_io.write_ply(output_path, pts, colors=cols)
    elif output_type == "NVM":
        if not model_formats.export_nvm(rec, output_path, skip_distortion):
            return 1
    elif output_type == "BUNDLER":
        if not model_formats.export_bundler(
            rec, output_path + ".bundle.out", output_path + ".list.txt", skip_distortion
        ):
            return 1
    elif output_type == "CAM":
        if not model_formats.export_cam(rec, output_path, skip_distortion):
            return 1
    elif output_type == "VRML":
        base = output_path.rsplit(".", 1)[0]
        model_formats.export_vrml(rec, base + ".images.wrl", base + ".points3D.wrl")
    else:
        print(f"unsupported output_type {output_type}")
        return 1
    print(f"Converted model to {output_type}")
    return 0


def cmd_model_analyzer(argv):
    input_path = None
    it = iter(argv)
    for a in it:
        if a == "--path" or a == "--input_path":
            input_path = next(it)
    from .models.reconstruction import Reconstruction

    rec = Reconstruction.read(input_path)
    rec.update_point_errors()
    obs = sum(len(p.track) for p in rec.points3D.values())
    stats = {
        "cameras": len(rec.cameras),
        "images": len(rec.images),
        "registered_images": rec.num_reg_images,
        "points3D": len(rec.points3D),
        "observations": obs,
        "mean_track_length": round(rec.mean_track_length(), 4),
        "mean_observations_per_image": round(obs / max(rec.num_reg_images, 1), 2),
        "mean_reprojection_error_px": round(rec.mean_reprojection_error(), 4),
    }
    for k, v in stats.items():
        print(f"{k}: {v}")
    return 0


def cmd_model_transformer(argv):
    """Apply a similarity transform from a 3x4 text file (RunModelTransformer)."""
    input_path = output_path = transform_path = None
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        elif a == "--transform_path":
            transform_path = next(it)
    import jax.numpy as jnp

    from .models.reconstruction import Reconstruction
    from .ops import se3

    rec = Reconstruction.read(input_path)
    M = np.loadtxt(transform_path).reshape(3, 4)
    R = M[:, :3]
    s = float(np.cbrt(np.linalg.det(R)))
    Rn = R / s
    q = np.asarray(se3.rotmat_to_quat(jnp.asarray(Rn, jnp.float32)))
    rec.transform(q, M[:, 3], scale=s)
    rec.write(output_path)
    print("Transformed model")
    return 0


def cmd_model_aligner(argv):
    """Align a model to reference positions ('name x y z' rows).

    Robust path (default, reference exe/model.cc RunModelAligner with
    robust_alignment=true → Reconstruction::AlignRobust): RANSAC over
    minimal-3 Umeyama similarity hypotheses gated by
    --robust_alignment_max_error, LO-refit on inliers, then an L1 polish of
    the 3x4 transform via least-absolute-deviations (ops/lad.py, the
    reference's optim/least_absolute_deviations solver) projected back to
    sim3 — accepted only if it lowers the mean inlier error.
    --robust_alignment 0 falls back to plain Umeyama (reference Align)."""
    input_path = output_path = ref_path = None
    robust = True
    max_error = 0.0
    min_common = 3
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        elif a == "--ref_images_path":
            ref_path = next(it)
        elif a == "--robust_alignment":
            robust = next(it) not in ("0", "false", "False")
        elif a == "--robust_alignment_max_error":
            max_error = float(next(it))
        elif a == "--min_common_images":
            min_common = int(next(it))
    if robust and max_error <= 0:
        print("ERROR: You must provide a maximum alignment error > 0")
        return 1
    import jax
    import jax.numpy as jnp

    from .models.reconstruction import Reconstruction
    from .ops import lad, ransac, se3, solvers

    rec = Reconstruction.read(input_path)
    refs = {}
    with open(ref_path) as f:
        for line in f:
            tok = line.split()
            if len(tok) >= 4:
                refs[tok[0]] = np.asarray([float(x) for x in tok[1:4]])
    src, dst = [], []
    for img in rec.images.values():
        if img.registered and img.name in refs:
            src.append(img.projection_center())
            dst.append(refs[img.name])
    if len(src) < max(3, min_common):
        print("Not enough reference images")
        return 1
    src = jnp.asarray(np.stack(src), jnp.float32)
    dst = jnp.asarray(np.stack(dst), jnp.float32)
    n_used = src.shape[0]
    if robust:
        res = ransac.ransac_similarity(
            src, dst, jnp.ones(n_used), jax.random.PRNGKey(0),
            ransac.RansacOptions(max_error=max_error, num_hypotheses=1024),
        )
        q, t, s, mask, n_in = jax.device_get(
            (res.q, res.t, res.s, res.inlier_mask, res.num_inliers)
        )
        if int(n_in) < max(3, min_common):
            print("Robust alignment failed: too few inliers")
            return 1
        # L1 polish on the inlier set: min_M sum ||M [x;1] - y||_1 over the
        # free 3x4 M, then project back to a similarity.
        srcn, dstn = np.asarray(src), np.asarray(dst)
        inl = np.asarray(mask, bool)
        Xh = np.concatenate([srcn[inl], np.ones((inl.sum(), 1), np.float32)], axis=1)
        A = np.kron(np.eye(3, dtype=np.float32), Xh)  # [3m, 12]
        b = dstn[inl].T.reshape(-1)  # y-coords grouped per output row
        sR = float(s) * np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
        x0 = np.concatenate([np.concatenate([sR, np.asarray(t)[:, None]], 1).reshape(-1)])
        x = np.asarray(lad.solve_least_absolute_deviations(A, b, x0=jnp.asarray(x0)))
        M = x.reshape(3, 4)
        s2 = float(np.cbrt(max(np.linalg.det(M[:, :3]), 1e-12)))
        U, _, Vt = np.linalg.svd(M[:, :3] / s2)
        R2 = U @ Vt
        q2 = np.asarray(se3.rotmat_to_quat(jnp.asarray(R2, jnp.float32)))
        err_ransac = np.abs(float(s) * srcn[inl] @ np.asarray(sR / float(s)).T + np.asarray(t) - dstn[inl]).sum(1).mean()
        err_lad = np.abs(s2 * srcn[inl] @ R2.T + M[:, 3] - dstn[inl]).sum(1).mean()
        if err_lad < err_ransac:
            q, t, s = q2, M[:, 3], s2
        n_ref = int(n_in)
    else:
        q, t, s = jax.device_get(solvers.umeyama(src, dst, with_scale=True))
        n_ref = n_used
    rec.transform(np.asarray(q), np.asarray(t), float(s))
    errs = []
    for img in rec.images.values():
        if img.registered and img.name in refs:
            errs.append(float(np.linalg.norm(img.projection_center() - refs[img.name])))
    print(
        f"Aligned model (scale {float(s):.4f}, {n_ref}/{n_used} refs; "
        f"error mean {np.mean(errs):.4f} median {np.median(errs):.4f})"
    )
    rec.write(output_path)
    return 0


def _paths(argv, *names):
    out = {n: None for n in names}
    it = iter(argv)
    for a in it:
        key = a[2:] if a.startswith("--") else None
        if key in out:
            out[key] = next(it)
    return out


def cmd_model_merger(argv):
    p = _paths(argv, "input_path1", "input_path2", "output_path")
    from .models.model_tools import merge_models
    from .models.reconstruction import Reconstruction

    r1 = Reconstruction.read(p["input_path1"])
    r2 = Reconstruction.read(p["input_path2"])
    out = merge_models(r1, r2)
    if out is None:
        print("Merge failed: not enough common registered images")
        return 1
    out.write(p["output_path"])
    print(f"Merged: {out.num_reg_images} images, {len(out.points3D)} points")
    return 0


def cmd_model_cropper(argv):
    p = _paths(argv, "input_path", "output_path", "boundary")
    from .models.model_tools import crop_model
    from .models.reconstruction import Reconstruction

    vals = [float(x) for x in p["boundary"].split(",")]
    rec = crop_model(Reconstruction.read(p["input_path"]), vals[:3], vals[3:6])
    rec.write(p["output_path"])
    print(f"Cropped: {rec.num_reg_images} images, {len(rec.points3D)} points")
    return 0


def cmd_model_splitter(argv):
    p = _paths(argv, "input_path", "output_path", "num_parts", "axis", "overlap")
    from .models.model_tools import split_model
    from .models.reconstruction import Reconstruction

    parts = split_model(
        Reconstruction.read(p["input_path"]),
        int(p["num_parts"] or 2),
        int(p["axis"] or 0),
        float(p["overlap"] or 0.0),
    )
    for k, r in enumerate(parts):
        r.write(os.path.join(p["output_path"], str(k)))
    print(f"Split into {len(parts)} parts")
    return 0


def cmd_model_orientation_aligner(argv):
    """RunModelOrientationAligner (exe/model.cc:735-796): align the model's
    vertical/horizontal axes by MANHATTAN-WORLD (per-image vanishing points)
    or IMAGE-ORIENTATION (gravity consensus); PRINCIPAL (PCA axes) kept as
    a third, image-free method."""
    p = _paths(
        argv, "input_path", "output_path", "image_path", "method", "max_image_size"
    )
    from .models import coordinate_frame as cf
    from .models.reconstruction import Reconstruction
    from .ops import np_geom

    method = (p.get("method") or "manhattan-world").lower()
    rec = Reconstruction.read(p["input_path"])
    if method == "manhattan-world":
        if not p.get("image_path"):
            print("ERROR: MANHATTAN-WORLD alignment needs --image_path")
            return 1
        opts = cf.ManhattanWorldFrameEstimationOptions(
            max_image_size=int(p.get("max_image_size") or 1024)
        )
        frame = cf.estimate_manhattan_world_frame(opts, rec, p["image_path"])
        R = cf.orientation_aligner_rotation(frame)
        rec.transform(np_geom.rotmat_to_quat(R), np.zeros(3), 1.0)
    elif method == "image-orientation":
        g = cf.estimate_gravity_vector_from_image_orientation(rec)
        R = cf.rotation_from_unit_vectors(g, np.asarray([0.0, 1.0, 0.0]))
        rec.transform(np_geom.rotmat_to_quat(R), np.zeros(3), 1.0)
    elif method == "principal":
        from .models.model_tools import align_to_principal_axes

        rec = align_to_principal_axes(rec)
    else:
        print("ERROR: Invalid `method` - 'MANHATTAN-WORLD', 'IMAGE-ORIENTATION' or 'PRINCIPAL'")
        return 1
    rec.write(p["output_path"])
    print(f"Aligned model orientation ({method})")
    return 0


def cmd_model_comparer(argv):
    p = _paths(argv, "input_path1", "input_path2")
    from .models.model_tools import compare_models
    from .models.reconstruction import Reconstruction

    stats = compare_models(
        Reconstruction.read(p["input_path1"]), Reconstruction.read(p["input_path2"])
    )
    for k, v in stats.items():
        print(f"{k}: {v}")
    return 0


def cmd_database_cleaner(argv):
    p = _paths(argv, "database_path", "type")
    from .models.database import Database

    db = Database(p["database_path"])
    t = (p["type"] or "all").lower()
    if t in ("all", "matches"):
        db.conn.execute("DELETE FROM matches")
        db.conn.execute("DELETE FROM two_view_geometries")
    if t in ("all", "features"):
        db.conn.execute("DELETE FROM keypoints")
        db.conn.execute("DELETE FROM descriptors")
    if t == "all":
        db.conn.execute("DELETE FROM images")
        db.conn.execute("DELETE FROM cameras")
    db.commit()
    db.close()
    print(f"Cleaned {t}")
    return 0


def cmd_database_merger(argv):
    p = _paths(argv, "database_path1", "database_path2", "merged_database_path")
    from .models.database import Database

    out = Database(p["merged_database_path"])
    id_maps = []
    for src_path in (p["database_path1"], p["database_path2"]):
        src = Database(src_path)
        cam_map = {}
        for cid, c in src.cameras().items():
            cam_map[cid] = out.add_camera(
                c["model_id"], c["width"], c["height"], c["params"], c["prior_focal"]
            )
        img_map = {}
        for iid, im in src.images().items():
            img_map[iid] = out.add_image(im["name"], cam_map[im["camera_id"]])
            out.write_keypoints(img_map[iid], src.read_keypoints(iid))
            out.write_descriptors(img_map[iid], src.read_descriptors(iid))
        for i, j in src.all_two_view_pair_ids():
            g = src.read_two_view_geometry(i, j)
            out.write_matches(img_map[i], img_map[j], src.read_matches(i, j))
            out.write_two_view_geometry(
                img_map[i], img_map[j], g["inlier_matches"], g["config"],
                F=g["F"], E=g["E"], H=g["H"],
            )
        src.close()
        id_maps.append(img_map)
    out.commit()
    out.close()
    print("Merged databases")
    return 0


def cmd_image_undistorter(argv):
    image_path = input_path = output_path = None
    it = iter(argv)
    for a in it:
        if a == "--image_path":
            image_path = next(it)
        elif a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
    from .models.undistortion import run_image_undistorter

    n = run_image_undistorter(image_path, input_path, output_path)
    print(f"Undistorted {n} images")
    return 0


def cmd_patch_match_stereo(argv):
    """Dense stereo over an undistorted workspace (RunPatchMatchStereo —
    plane-sweep formulation, see ops/stereo.py)."""
    workspace = None
    it = iter(argv)
    for a in it:
        if a == "--workspace_path":
            workspace = next(it)
    from .models.mvs import DenseOptions, run_patch_match_stereo

    n = run_patch_match_stereo(workspace, DenseOptions())
    print(f"Computed depth/normal maps for {n} views")
    return 0


def cmd_stereo_fusion(argv):
    workspace = output_path = None
    it = iter(argv)
    for a in it:
        if a == "--workspace_path":
            workspace = next(it)
        elif a == "--output_path":
            output_path = next(it)
    from .models.mvs import DenseOptions, run_stereo_fusion

    pts, nrm, col = run_stereo_fusion(workspace, output_path, DenseOptions())
    print(f"Fused {len(pts)} points")
    return 0


def cmd_poisson_mesher(argv):
    """Fused oriented point cloud -> surface mesh (RunPoissonMesher,
    src/exe/colmap.cc; mvs/meshing.h:106-125). Spectral Poisson solve on the
    TPU + marching tetrahedra (ops/meshing.py)."""
    input_path, output_path = None, None
    depth, trim, point_weight = 7, 7.0, 1.0
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        elif a == "--PoissonMeshing.depth":
            depth = int(next(it))
        elif a == "--PoissonMeshing.trim":
            trim = float(next(it))
        elif a == "--PoissonMeshing.point_weight":
            point_weight = float(next(it))
    if not input_path or not output_path:
        print("usage: poisson_mesher --input_path fused.ply --output_path meshed.ply")
        return 1
    from .io import ply as ply_io
    from .ops.meshing import PoissonOptions, poisson_mesh

    data = ply_io.read_ply(input_path)
    if data.normals is None:
        print(f"{input_path} has no normals; run stereo_fusion first")
        return 1
    verts, faces = poisson_mesh(
        data.xyz, data.normals,
        PoissonOptions(depth=depth, trim=trim, point_weight=point_weight),
    )
    ply_io.write_ply_mesh(output_path, verts, faces)
    print(f"Meshed {len(data.xyz)} points -> {len(verts)} vertices, {len(faces)} faces: {output_path}")
    return 0


def cmd_delaunay_mesher(argv):
    """Sparse/dense Delaunay meshing with visibility graph cut
    (RunDelaunayMesher; mvs/meshing.h:110-127, Labatut et al. 2009).
    --input_path: a sparse model dir (sparse mode) or a dense workspace
    containing fused.ply + sparse/ (dense mode, the reference's default)."""
    input_path, output_path, input_type = None, None, "dense"
    qreg, vis_sigma = 1.0, 3.0
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        elif a == "--input_type":
            input_type = next(it)
        elif a == "--DelaunayMeshing.quality_regularization":
            qreg = float(next(it))
        elif a == "--DelaunayMeshing.visibility_sigma":
            vis_sigma = float(next(it))
    if not input_path or not output_path:
        print("usage: delaunay_mesher --input_path <sparse_model|dense_workspace>"
              " --output_path meshed.ply [--input_type sparse|dense]")
        return 1
    from .io import ply as ply_io
    from .models.reconstruction import Reconstruction
    from .ops.delaunay import (
        DelaunayMeshingOptions,
        dense_delaunay_mesh,
        sparse_delaunay_mesh,
    )

    opts = DelaunayMeshingOptions(
        quality_regularization=qreg, visibility_sigma=vis_sigma
    )
    if input_type == "sparse":
        rec = Reconstruction.read(input_path)
        verts, faces = sparse_delaunay_mesh(rec, opts)
    else:
        fused = os.path.join(input_path, "fused.ply")
        if not os.path.exists(fused):
            print(f"{fused} not found; run stereo_fusion first")
            return 1
        rec = Reconstruction.read(os.path.join(input_path, "sparse"))
        data = ply_io.read_ply(fused)
        verts, faces = dense_delaunay_mesh(data.xyz, rec, opts)
    ply_io.write_ply_mesh(output_path, verts, faces)
    print(f"Delaunay meshed -> {len(verts)} vertices, {len(faces)} faces: {output_path}")
    return 0


def cmd_database_creator(argv):
    om, _ = _opt(argv)
    from .models.database import Database

    Database(om.database_path).close()
    print(f"Created database {om.database_path}")
    return 0


def cmd_automatic_reconstructor(argv):
    """One-click pipeline (AutomaticReconstructionController parity):
    extract -> match -> map, then with --dense 1 the dense stage
    (undistort -> stereo -> fusion -> poisson mesh)."""
    workspace = image_path = None
    dense = False
    filtered = []
    it = iter(argv)
    for a in it:
        if a == "--workspace_path":
            workspace = next(it)
        elif a == "--image_path":
            image_path = next(it)
        elif a == "--dense":
            dense = next(it).lower() in ("1", "true")
        else:
            filtered.append(a)
    om, _ = _opt(filtered)
    os.makedirs(workspace, exist_ok=True)
    om.database_path = os.path.join(workspace, "database.db")
    om.image_path = image_path
    cmd_feature_extractor(
        ["--database_path", om.database_path, "--image_path", image_path]
        + filtered
    )
    cmd_exhaustive_matcher(["--database_path", om.database_path] + filtered)
    os.makedirs(os.path.join(workspace, "sparse"), exist_ok=True)
    rc = cmd_mapper(
        ["--database_path", om.database_path, "--image_path", image_path,
         "--output_path", os.path.join(workspace, "sparse")] + filtered
    )
    if rc != 0 or not dense:
        return rc
    sparse0 = os.path.join(workspace, "sparse", "0")
    if not os.path.isdir(sparse0):
        sparse0 = os.path.join(workspace, "sparse")
    dense_dir = os.path.join(workspace, "dense")
    rc = cmd_image_undistorter(
        ["--image_path", image_path, "--input_path", sparse0,
         "--output_path", dense_dir]
    )
    if rc == 0:
        rc = cmd_patch_match_stereo(["--workspace_path", dense_dir])
    if rc == 0:
        rc = cmd_stereo_fusion(["--workspace_path", dense_dir])
    if rc == 0:
        rc = cmd_poisson_mesher(
            ["--input_path", os.path.join(dense_dir, "fused.ply"),
             "--output_path", os.path.join(dense_dir, "meshed-poisson.ply")]
        )
    return rc


def cmd_model_viewer(argv):
    """Export a reconstruction as a self-contained HTML WebGL viewer — the
    headless replacement for the reference's Qt ModelViewerWidget painters
    (src/ui/model_viewer_widget.h:125-184): SfM points, camera frusta, lidar
    map, and association lines colored by type (red=proj, blue=icp,
    yellow=ground)."""
    p = _paths(argv, "input_path", "output_path", "lidar_path",
               "max_lidar_points", "frustum_scale")
    from .io import viewer as viewer_io
    from .models.reconstruction import Reconstruction

    rec = Reconstruction.read(p["input_path"])
    lidar_pts = None
    if p["lidar_path"]:
        from .io import ply as ply_io

        lidar_pts = ply_io.read_ply(p["lidar_path"]).xyz
    out = viewer_io.export_viewer_html(
        rec,
        p["output_path"],
        lidar_pts=lidar_pts,
        max_lidar_points=int(p["max_lidar_points"] or 300000),
        frustum_scale=float(p["frustum_scale"] or 0.4),
    )
    print(f"viewer written to {out} ({rec.num_reg_images} images, "
          f"{len(rec.points3D)} points) — open in any browser")
    return 0


def cmd_color_extractor(argv):
    """Mean-track point colors from source images (RunColorExtractor,
    exe/sfm.cc:168; reconstruction.cc ExtractColorsForAllImages)."""
    p = _paths(argv, "image_path", "input_path", "output_path")
    from .models.reconstruction import Reconstruction

    rec = Reconstruction.read(p["input_path"])
    rec.extract_colors_for_all_images(p["image_path"])
    rec.write(p["output_path"])
    n_colored = sum(1 for pt in rec.points3D.values() if pt.color.any())
    print(f"Extracted colors for {n_colored}/{len(rec.points3D)} points")
    return 0


def cmd_feature_importer(argv):
    """Import COLMAP text feature files (RunFeatureImporter, exe/feature.cc:177)."""
    import_path = image_list_path = None
    filtered = []
    it = iter(argv)
    for a in it:
        if a == "--import_path":
            import_path = next(it)
        elif a == "--image_list_path":
            image_list_path = next(it)
        else:
            filtered.append(a)
    om, _ = _opt(filtered)
    from .models.feature_pipeline import ImageReaderConfig, run_feature_importer

    reader = ImageReaderConfig(
        camera_model=om.image_reader.camera_model,
        single_camera=om.image_reader.single_camera,
        camera_params=om.image_reader.camera_params,
        default_focal_factor=om.image_reader.default_focal_length_factor,
    )
    n = run_feature_importer(om.database_path, om.image_path, import_path, reader)
    print(f"Imported features for {n} images")
    return 0


def cmd_image_deleter(argv):
    """Deregister images by id/name list (RunImageDeleter, exe/image.cc:77)."""
    p = _paths(argv, "input_path", "output_path", "image_ids_path", "image_names_path")
    from .models.reconstruction import Reconstruction

    rec = Reconstruction.read(p["input_path"])
    if p["image_ids_path"]:
        with open(p["image_ids_path"]) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                iid = int(line)
                if iid in rec.images and rec.images[iid].registered:
                    print(f"Deleting image_id={iid}, image_name={rec.images[iid].name}")
                    rec.deregister_image(iid)
                else:
                    print(f"WARNING: Skipping image_id={iid} (not in reconstruction)")
    if p["image_names_path"]:
        by_name = {img.name: iid for iid, img in rec.images.items()}
        with open(p["image_names_path"]) as f:
            for line in f:
                name = line.strip()
                if not name:
                    continue
                iid = by_name.get(name)
                if iid is not None and rec.images[iid].registered:
                    print(f"Deleting image_id={iid}, image_name={name}")
                    rec.deregister_image(iid)
                else:
                    print(f"WARNING: Skipping image_name={name} (not in reconstruction)")
    rec.write(p["output_path"])
    return 0


def cmd_image_filterer(argv):
    """Deregister images with bogus intrinsics or too few observations
    (RunImageFilterer, exe/image.cc:155)."""
    p = _paths(argv, "input_path", "output_path", "min_focal_length_ratio",
               "max_focal_length_ratio", "max_extra_param", "min_num_observations")
    from .models.reconstruction import Reconstruction

    rec = Reconstruction.read(p["input_path"])
    min_fr = float(p["min_focal_length_ratio"] or 0.1)
    max_fr = float(p["max_focal_length_ratio"] or 10.0)
    max_ep = float(p["max_extra_param"] or 100.0)
    min_obs = int(p["min_num_observations"] or 10)
    n0 = rec.num_reg_images
    to_drop = []
    for iid in list(rec.registered_ids):
        img = rec.images[iid]
        cam = rec.cameras[img.camera_id]
        if cam.has_bogus_params(min_fr, max_fr, max_ep) or img.num_points3D() < min_obs:
            to_drop.append(iid)
    for iid in to_drop:
        rec.deregister_image(iid)
    print(f"Filtered {n0 - rec.num_reg_images} images from a total of {n0} images")
    rec.write(p["output_path"])
    return 0


def cmd_image_rectifier(argv):
    """Stereo-rectify image pairs against a model (RunImageRectifier,
    exe/image.cc:204; base/undistortion.cc RectifyStereoCameras): undistort
    both cameras, rotate so both optical axes are perpendicular to the
    baseline with row-aligned epipolar lines, warp via one homography per
    image, and write `<name1>-<name2>` rectified pairs."""
    p = _paths(argv, "image_path", "input_path", "output_path", "stereo_pairs_list")
    import jax.numpy as jnp

    from .models.reconstruction import Reconstruction
    from .models.undistortion import rectify_stereo_pair, undistorted_camera
    from .utils import image as image_utils

    rec = Reconstruction.read(p["input_path"])
    by_name = {img.name: iid for iid, img in rec.images.items()}
    os.makedirs(p["output_path"], exist_ok=True)
    n = 0
    with open(p["stereo_pairs_list"]) as f:
        for line in f:
            names = line.split()
            if len(names) != 2:
                continue
            id1, id2 = by_name[names[0]], by_name[names[1]]
            img1 = image_utils.imread_rgb(os.path.join(p["image_path"], names[0]))
            img2 = image_utils.imread_rgb(os.path.join(p["image_path"], names[1]))
            r1, r2 = rectify_stereo_pair(rec, id1, id2, img1, img2)
            from PIL import Image as PILImage

            stem = f"{os.path.splitext(names[0])[0]}-{os.path.splitext(names[1])[0]}"
            PILImage.fromarray(r1).save(os.path.join(p["output_path"], stem + "_1.png"))
            PILImage.fromarray(r2).save(os.path.join(p["output_path"], stem + "_2.png"))
            n += 1
    print(f"Rectified {n} stereo pairs")
    return 0


def cmd_image_registrator(argv):
    """Register new database images into an existing model WITHOUT mapping
    (RunImageRegistrator, exe/image.cc:239): PnP + pose refine per image, no
    triangulation, no BA."""
    input_path = output_path = None
    filtered = []
    it = iter(argv)
    for a in it:
        if a == "--input_path":
            input_path = next(it)
        elif a == "--output_path":
            output_path = next(it)
        else:
            filtered.append(a)
    om, _ = _opt(filtered)
    from .models.incremental_mapper import IncrementalMapper

    rec, graph, lmap, priors = _load_mapper_inputs(om, input_path)
    mapper = IncrementalMapper(rec, graph, lmap, priors)
    mapper.begin_reconstruction(rec)
    mopts = _mapper_options(om)
    n_new = 0
    for iid in sorted(rec.images.keys()):
        if rec.images[iid].registered:
            continue
        print(f"Registering image #{iid} ({rec.num_reg_images + 1})")
        if mapper.register_next_image(mopts, iid):
            n_new += 1
    mapper.end_reconstruction(discard=False)
    rec.write(output_path)
    print(f"Registered {n_new} new images")
    return 0


def cmd_image_undistorter_standalone(argv):
    """Undistort images listed as 'name MODEL params...' rows without any
    reconstruction (RunImageUndistorterStandalone, exe/image.cc:407)."""
    p = _paths(argv, "image_path", "input_file", "output_path")
    from .models.reconstruction import Camera
    from .models.undistortion import undistort_image, undistorted_camera
    from .ops import camera_models as cm
    from .utils import image as image_utils

    os.makedirs(p["output_path"], exist_ok=True)
    n = 0
    with open(p["input_file"]) as f:
        for line in f:
            tok = line.split()
            if len(tok) < 2:
                continue
            name, model_name = tok[0], tok[1]
            params = np.asarray([float(x) for x in tok[2:]])
            img = image_utils.imread_rgb(os.path.join(p["image_path"], name))
            cam = Camera(1, cm.MODEL_IDS[model_name], img.shape[1], img.shape[0], params)
            new_cam = undistorted_camera(cam)
            out = undistort_image(img, cam, new_cam)
            from PIL import Image as PILImage

            dst = os.path.join(p["output_path"], name)
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            PILImage.fromarray(out).save(dst)
            n += 1
    print(f"Undistorted {n} images")
    return 0


def cmd_point_filtering(argv):
    """Filter 3D points by reproj error / tri angle / track length
    (RunPointFiltering, exe/sfm.cc:303)."""
    p = _paths(argv, "input_path", "output_path", "min_track_len",
               "max_reproj_error", "min_tri_angle")
    from .models.reconstruction import Reconstruction

    rec = Reconstruction.read(p["input_path"])
    min_track_len = int(p["min_track_len"] or 2)
    n = rec.filter_points3D(
        max_reproj_error=float(p["max_reproj_error"] or 4.0),
        min_tri_angle_deg=float(p["min_tri_angle"] or 1.5),
    )
    for pid in list(rec.points3D.keys()):
        if len(rec.points3D[pid].track) < min_track_len:
            n += len(rec.points3D[pid].track)
            rec.delete_point3D(pid)
    print(f"Filtered observations: {n}")
    rec.write(p["output_path"])
    return 0


def cmd_project_generator(argv):
    """Write a full project.ini at a quality preset (RunProjectGenerator,
    exe/gui.cc:77)."""
    p = _paths(argv, "output_path", "quality")
    from .utils.config import OptionManager

    om = OptionManager()
    try:
        om.modify_for_quality(p["quality"] or "high")
    except ValueError as e:
        print(f"ERROR: {e}")
        return 1
    om.write_ini(p["output_path"])
    print(f"Wrote project file to {p['output_path']}")
    return 0


def cmd_gui(argv):
    print(
        "This is the headless TPU build: there is no Qt GUI. Use "
        "`model_viewer --input_path <sparse> --output_path viewer.html` for a "
        "standalone browser viewer (points, frusta, lidar associations), or "
        "`model_converter --output_type PLY/TXT` for COLMAP-compatible viewers; "
        "poses export via Mapper.image_pose_save_folder (pose.ply)."
    )
    return 0


COMMANDS = {
    "feature_extractor": cmd_feature_extractor,
    "exhaustive_matcher": cmd_exhaustive_matcher,
    "sequential_matcher": cmd_sequential_matcher,
    "transitive_matcher": cmd_transitive_matcher,
    "vocab_tree_matcher": cmd_vocab_tree_matcher,
    "spatial_matcher": cmd_spatial_matcher,
    "vocab_tree_builder": cmd_vocab_tree_builder,
    "vocab_tree_retriever": cmd_vocab_tree_retriever,
    "matches_importer": cmd_matches_importer,
    "mapper": cmd_mapper,
    "hierarchical_mapper": cmd_hierarchical_mapper,
    "point_triangulator": cmd_point_triangulator,
    "bundle_adjuster": cmd_bundle_adjuster,
    "rig_bundle_adjuster": cmd_rig_bundle_adjuster,
    "model_converter": cmd_model_converter,
    "model_analyzer": cmd_model_analyzer,
    "model_transformer": cmd_model_transformer,
    "model_aligner": cmd_model_aligner,
    "model_merger": cmd_model_merger,
    "model_cropper": cmd_model_cropper,
    "model_splitter": cmd_model_splitter,
    "model_orientation_aligner": cmd_model_orientation_aligner,
    "model_comparer": cmd_model_comparer,
    "database_cleaner": cmd_database_cleaner,
    "database_merger": cmd_database_merger,
    "image_undistorter": cmd_image_undistorter,
    "patch_match_stereo": cmd_patch_match_stereo,
    "stereo_fusion": cmd_stereo_fusion,
    "poisson_mesher": cmd_poisson_mesher,
    "delaunay_mesher": cmd_delaunay_mesher,
    "database_creator": cmd_database_creator,
    "automatic_reconstructor": cmd_automatic_reconstructor,
    "model_viewer": cmd_model_viewer,
    "color_extractor": cmd_color_extractor,
    "feature_importer": cmd_feature_importer,
    "image_deleter": cmd_image_deleter,
    "image_filterer": cmd_image_filterer,
    "image_rectifier": cmd_image_rectifier,
    "image_registrator": cmd_image_registrator,
    "image_undistorter_standalone": cmd_image_undistorter_standalone,
    "point_filtering": cmd_point_filtering,
    "project_generator": cmd_project_generator,
    "gui": cmd_gui,
}


def _init_compile_cache():
    """Persist compiled executables across CLI invocations — through the axon
    TPU tunnel each fresh compile costs minutes."""
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("COLMAP_PCD_TPU_CACHE", "/tmp/jax_cache_colmap_pcd"),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main(argv=None):
    _init_compile_cache()
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help", "help"):
        print("usage: python -m colmap_pcd_tpu <command> [--flags]")
        print("commands:", ", ".join(sorted(COMMANDS)))
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd}; available:", ", ".join(sorted(COMMANDS)))
        return 1
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
