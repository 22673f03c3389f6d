"""GENERATED VALUES-oracle data — not hand-written implementation.

Files here are emitted by the ``tools/gen_*_oracle.py`` generators
(independent scalar/numpy replications that refuse on any disagreement with
the engine kernels) and exist only as hash-check targets for the driver's
correctness gate.  Exclude this package when comparing implementation LoC
against the reference: it is data, not code.
"""
