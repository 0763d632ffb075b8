import numpy as np


def expit(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype="float64"))) if not hasattr(x, "index") \
        else 1.0 / (1.0 + np.exp(-x))


def logit(p):
    return np.log(p / (1.0 - p))


def softmax(x):
    a = np.asarray(x, dtype="float64")
    e = np.exp(a - np.nanmax(a))
    return e / np.nansum(e)
