from incubator_hugegraph_computer_spark.sources.repo_files import generate_repo_files  # noqa: F401
from incubator_hugegraph_computer_spark.sources.extractor import (  # noqa: F401
    build_catalog,
    extract_edges,
    verify_sha256,
)
