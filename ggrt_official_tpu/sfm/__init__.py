"""Offline SfM pipeline (host-side; SURVEY.md layer L7).

The reference shells out to hloc (SuperPoint/SuperGlue/NetVLAD) + COLMAP
(/root/reference/scripts/extract_relative_poses.py,
preprocess_dbarf_dataset.py); neither ships here, so the same pipeline
stages are built on OpenCV + numpy with matching interfaces:

  retrieval.py       — global descriptors + top-k pair selection
                       (pairs_from_retrieval equivalent)
  two_view.py        — SIFT features, ratio matching, essential-matrix
                       two-view geometries
  disambiguation.py  — geodesic-consistency match scoring + filters
                       (calculate_geodesic_consistency_scores /
                       filter_matches equivalents)
  pipeline.py        — end-to-end driver: images -> view graph (g2o) ->
                       MST-initialized global poses -> poses_bounds.npy
"""
from .pipeline import run_sfm_pipeline  # noqa: F401
