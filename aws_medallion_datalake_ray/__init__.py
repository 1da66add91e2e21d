"""aws_medallion_datalake_ray — a Ray-Data-native lakehouse maintenance engine.

A from-scratch re-expression of the capabilities of the
``01001102/aws-medallion-datalake`` reference (an AWS Glue/Step-Functions
medallion pipeline; see SURVEY.md) on idiomatic Ray Data:

- ``state``     — snapshot/manifest tree (atomic-swap JSON), checkpoint ledger,
                  and the :class:`~aws_medallion_datalake_ray.state.table.LakeTable`
                  table abstraction (append/overwrite/scan/compact/zorder/merge/expire).
- ``functions`` — vectorized Arrow/numpy kernels: cleaning (the reference's
                  silver rules), hashing, Z-order/Hilbert keys, text analysis,
                  dedup (exact/minhash/simhash), embedding similarity.
- ``stages``    — stateful actor-pool stages (stats collectors, multimodal stubs).
- ``sources``   — snapshot-consistent parquet scans + deterministic fixtures.
- ``pipelines`` — bronze→silver→gold medallion promotion and the relational
                  query suite used for oracle verification.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, tests' conftest, bench.py).
"""

from aws_medallion_datalake_ray.schema import SOURCE_FILES_SCHEMA  # noqa: F401

__version__ = "0.1.0"
