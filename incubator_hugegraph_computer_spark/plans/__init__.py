from incubator_hugegraph_computer_spark.plans.bsp import BspEngine, BspProgram, SuperstepContext  # noqa: F401
from incubator_hugegraph_computer_spark.plans.checkpoint import CheckpointManager  # noqa: F401
