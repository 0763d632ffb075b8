# minimal dispatch shim: single-registration passthrough keyed by arity of
# declared types; good enough for janitor's two-signature use
_registry = {}

def dispatch(*types):
    def deco(fn):
        key = (fn.__module__, fn.__qualname__.split('.')[0] if '.' in fn.__qualname__ else fn.__name__)
        name = fn.__name__
        regkey = (fn.__module__, name)
        impls = _registry.setdefault(regkey, [])
        impls.append((types, fn))
        def dispatched(*args, **kwargs):
            for tys, f in _registry[regkey]:
                if len(args) >= len(tys) and all(isinstance(a, t) for a, t in zip(args, tys)):
                    return f(*args, **kwargs)
            return _registry[regkey][-1][1](*args, **kwargs)
        dispatched.__name__ = name
        return dispatched
    return deco
