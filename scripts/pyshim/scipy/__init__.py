# minimal scipy.special shim for the differential harness: the standard
# textbook definitions via numpy, enough for janitor.math
from . import special  # noqa: F401
from . import stats  # noqa: F401
