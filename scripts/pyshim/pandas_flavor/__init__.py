import pandas as pd

def register_dataframe_method(fn):
    setattr(pd.DataFrame, fn.__name__, fn)
    return fn

def register_series_method(fn):
    setattr(pd.Series, fn.__name__, fn)
    return fn

def register_dataframe_accessor(name):
    def deco(cls):
        try:
            pd.api.extensions.register_dataframe_accessor(name)(cls)
        except Exception:
            pass
        return cls
    return deco

def register_xarray_dataarray_method(fn):
    return fn

def register_xarray_dataset_method(fn):
    return fn
