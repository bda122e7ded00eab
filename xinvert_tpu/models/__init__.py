from .api import *  # noqa: F401,F403
from .params import default_iParams, default_mParams  # noqa: F401
