from incubator_hugegraph_computer_spark.operators.pagerank import pagerank, pagerank_classic  # noqa: F401
from incubator_hugegraph_computer_spark.operators.wcc import wcc  # noqa: F401
from incubator_hugegraph_computer_spark.operators.lpa import lpa  # noqa: F401
from incubator_hugegraph_computer_spark.operators.triangle_count import triangle_count  # noqa: F401
from incubator_hugegraph_computer_spark.operators.degree import degree_centrality  # noqa: F401
