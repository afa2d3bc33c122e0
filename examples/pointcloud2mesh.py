"""Point cloud -> mesh via the SDF model (notebook equivalent).

Mirrors ``/root/reference/examples/pointcloud2mesh.ipynb``: load a point
cloud (npz), run the SDF model's cached encoding over a marching grid,
extract and save the mesh with nearest-neighbor vertex colors.
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pointcloud", required=True, help=".npz PointCloud")
    parser.add_argument("--sdf-checkpoint", required=True)
    parser.add_argument("--grid-size", type=int, default=128)
    parser.add_argument("--output", default="mesh.ply")
    args = parser.parse_args()

    import torch

    from pcdiff.core.point_e_import import import_sdf_torch_state
    from pcdiff.geometry import PointCloud
    from pcdiff.models.configs import MODEL_CONFIGS, model_from_config
    from pcdiff.utils.pc_to_mesh import marching_cubes_mesh

    model = model_from_config(MODEL_CONFIGS["sdf"])
    variables = import_sdf_torch_state(
        torch.load(args.sdf_checkpoint, map_location="cpu", weights_only=True)
    )
    pc = PointCloud.load(args.pointcloud)
    mesh = marching_cubes_mesh(
        pc, model, variables, grid_size=args.grid_size,
        fill_vertex_channels=True,
    )
    with open(args.output, "wb") as f:
        mesh.write_ply(f)
    print(f"wrote {args.output} ({len(mesh.verts)} verts, {len(mesh.faces)} faces)")


if __name__ == "__main__":
    main()
