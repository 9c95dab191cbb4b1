from .ottl import OTTL_FUNCTIONS, ottl_fn  # noqa: F401
