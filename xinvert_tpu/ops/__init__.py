from .tridiag import trace, traceCyclic, tridiag_solve  # noqa: F401
