from .fid import FIDScorer, compute_statistics, frechet_distance
