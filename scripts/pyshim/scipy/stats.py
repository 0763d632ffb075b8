# scipy.stats shim for the differential harness: the standard normal
# cdf/ppf via the python stdlib's statistics.NormalDist (exact to double
# precision), vectorized with numpy
from statistics import NormalDist

import numpy as np

_N = NormalDist()


class norm:
    @staticmethod
    def cdf(x):
        a = np.asarray(x, dtype="float64")
        return np.array([_N.cdf(v) if np.isfinite(v) else
                         (np.nan if np.isnan(v) else (0.0 if v < 0 else 1.0))
                         for v in a.ravel()]).reshape(a.shape)

    @staticmethod
    def ppf(p):
        a = np.asarray(p, dtype="float64")
        def one(v):
            if np.isnan(v):
                return np.nan
            if v <= 0.0:
                return -np.inf
            if v >= 1.0:
                return np.inf
            return _N.inv_cdf(v)
        return np.array([one(v) for v in a.ravel()]).reshape(a.shape)
