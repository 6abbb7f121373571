"""Stub pyntcloud: captures export2ply payloads as .npz next to the .ply path."""
import numpy as np


class PyntCloud:
    def __init__(self, df):
        self.df = df

    def to_file(self, path):
        pts = self.df[["x", "y", "z"]].to_numpy(dtype=np.float64)
        cols = self.df[["red", "green", "blue"]].to_numpy(dtype=np.float64)
        np.savez(path + ".npz", points=pts, colors=cols)
