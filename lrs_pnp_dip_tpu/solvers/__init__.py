from .admm import Solver, SolverDiverged, SolverState, StepAux, solve
from .batch import BatchedSolver, SeedEnsembleSolver
from .tiled import solve_tiled
from .dip import DipConfig, DipResult, get_dip_out, make_dip_fit
from .early_stop import EarlyStopState, init_early_stop, update_early_stop
from .fit import fit

__all__ = [
    "Solver",
    "SolverDiverged",
    "BatchedSolver",
    "SeedEnsembleSolver",
    "solve_tiled",
    "SolverState",
    "StepAux",
    "solve",
    "DipConfig",
    "DipResult",
    "get_dip_out",
    "make_dip_fit",
    "EarlyStopState",
    "init_early_stop",
    "update_early_stop",
    "fit",
]
