from aws_medallion_datalake_ray.state.manifest import DataFile, ManifestStore, Snapshot  # noqa: F401
from aws_medallion_datalake_ray.state.ledger import Ledger  # noqa: F401
from aws_medallion_datalake_ray.state.table import LakeTable  # noqa: F401
