"""End-to-end example mirroring the reference notebook's linear flow
(main.ipynb cells 1 -> 5-8 -> 10-13): calibrate, estimate geometry,
rectify, dense disparity, reproject, export a PLY point cloud.

Run from the repo root:
    python examples/notebook_flow.py [--calib-dir DIR] [--pair DIR]
Artifacts land in ./notebook_flow_out/.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calib-dir", default="/root/reference/calibration_data_logitech_3840x2160")
    ap.add_argument("--pair", default="/root/reference/dataset/d3")
    ap.add_argument("--outdir", default="notebook_flow_out")
    ap.add_argument("--ndisp", type=int, default=128)
    ap.add_argument("--max-calib-images", type=int, default=8)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from stereo_reconstruction_cv_tpu.io.image import (
        load_stereo_pair, read_baseline, save_image, glob_calibration_images,
    )
    from stereo_reconstruction_cv_tpu.pipeline import stages
    from stereo_reconstruction_cv_tpu.utils.draw import colormap_jet
    from stereo_reconstruction_cv_tpu.utils.profiling import METRICS, stage_timer

    # 1. Camera calibration (cell 1). Subsample images for a quick demo.
    import tempfile, shutil

    files = glob_calibration_images(args.calib_dir)[: args.max_calib_images]
    tmp = tempfile.mkdtemp()
    for f in files:
        os.symlink(f, os.path.join(tmp, os.path.basename(f)))
    with stage_timer("flow/calibrate"):
        calib = stages.calibrate(tmp)
    shutil.rmtree(tmp)
    if "error" in calib:
        print("calibration failed:", calib["error"])
        return 1
    print(f"calibrated from {calib['num_images']} views: "
          f"fx={calib['K'][0,0]:.1f} mean reprojection error={calib['mean_error']:.4f} px")

    # 2-3. Geometry + rectification on the stereo pair (cells 5-8).
    baseline = read_baseline(args.pair, default=0.14)
    with stage_timer("flow/rectify"):
        rect = stages.rectify_pair(args.pair, baseline=baseline,
                                   camera_matrix=calib["K"])
    print("recovered T direction:", np.round(rect["geometry"]["Translation Vector"].ravel(), 4))
    print("epiline |slope| after rectification:", f"{rect['epiline_mean_abs_slope']:.5f}")
    # The notebook's executed artifact set (cell 7 +100-104): the rectified
    # pair AND the epiline overlays on the rectified pair.
    save_image(os.path.join(args.outdir, "left_rectified.jpg"), rect["left_rectified"])
    save_image(os.path.join(args.outdir, "right_rectified.jpg"), rect["right_rectified"])
    save_image(os.path.join(args.outdir, "left_rectified_lines.jpg"),
               rect["Left Epilines (after)"])
    save_image(os.path.join(args.outdir, "right_rectified_lines.jpg"),
               rect["Right Points (after)"])

    # 4-5. Dense disparity on the rectified pair (cell 10; the notebook's
    # quirk of running SGBM on the unrectified pair with ndisp=16 is
    # consciously fixed here — SURVEY §7).
    with stage_timer("flow/disparity"):
        disp = stages.disparity(rect["left_rectified"], rect["right_rectified"],
                                ndisp=args.ndisp)
    save_image(os.path.join(args.outdir, "disparity_jet.png"), colormap_jet(disp))

    # 6-7. Reproject + export (cells 11-13).
    # PLY named after the dataset, as the notebook does (cell 13 +16-18:
    # f"{dataset_name}_point_cloud.ply").
    dataset_name = os.path.basename(os.path.normpath(args.pair))
    ply_name = f"{dataset_name}_point_cloud.ply"
    with stage_timer("flow/reconstruct"):
        pts = stages.reconstruct(disp, rect["Q"])
        n = stages.export_point_cloud(
            os.path.join(args.outdir, ply_name), pts, disp
        )
    print(f"wrote {n} points -> {args.outdir}/{ply_name}")
    print("stage timings:", METRICS.dump())
    return 0


if __name__ == "__main__":
    sys.exit(main())
