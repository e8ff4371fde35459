"""SLAM model families: dense tracker, sparse frontend, DWO graph, solvers,
place recognition."""
