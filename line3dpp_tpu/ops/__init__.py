"""Compute ops: the TPU-native equivalents of the reference's algorithm and
GPU layers (SURVEY.md §2.1 L3/L4).

Modules (imported lazily by the pipeline to keep import time low):
  geometry      batched rays/projection/line math     (view.cc equivalents)
  matching      epipolar all-pairs matching, XLA path (matchingCPU/GPU)
  matching_pallas  fused Pallas kernel + in-VMEM kNN  (K_match_lines)
  scoring       3D hypothesis verification, XLA path  (K_score_matches)
  scoring_pallas   fused VMEM similarity tile
  affinity      filtering, estimates, affinity edges  (filterMatches/similarity)
  collinearity  2D collinear pair analysis            (findCollinearSegments)
  rdd           replicator-dynamics diffusion         (performRDD)
  clustering    Felzenszwalb union-find, native C++   (performClustering)
  fitting       cluster -> 3D line fits               (get3DlineFromCluster)
  sweep         1D interval sweep                     (findCollinearSegments)
  bundling      batched LM line bundling              (LineOptimizer/Ceres)
  lsd           TPU LSD line detection                (lsd/lsd.cpp)
  undistort     Brown-model undistortion              (undistortImage)
"""
