"""File formats: PLY point clouds, COLMAP models, pose files."""
