from . import console
from . import checkpoint
from . import profiling
