"""newton_krylov_ooc_tpu: TPU-native Newton-Krylov framework for cyclo-stationary
tracer spin-up (same capabilities as klindsay28/Newton-Krylov_OOC, redesigned
JAX/XLA/pjit/Pallas-first).

Solves F(X) = 0 where X is a model initial state and F(X) is the state change
over one forward model run.  Armijo-globalized Newton with left-preconditioned
GMRES, block-independent over tracer modules and decoupled spatial regions,
resumable via a JSON step log; the forward models run as jitted implicit
integrators on TPU.
"""

__version__ = "0.1.0"
