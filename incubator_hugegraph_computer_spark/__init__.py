"""PySpark-native BSP-style link-graph analytics engine.

A from-scratch re-expression of apache/incubator-hugegraph-computer's
capabilities (reference at /root/reference, read-only) on idiomatic
PySpark: every superstep is a DataFrame join-aggregate message pass;
the driver owns control flow (the reference's etcd-coordinated master,
``computer-core/.../master/MasterService.java``, collapses into a
Python ``for`` loop); the Spark shuffle replaces the reference's
sort-combine-netty-merge message transport
(``computer-core/.../sender/MessageSendManager.java``,
``receiver/MessageRecvPartition.java``).

Nothing in this package is copied from the reference — semantics only.
"""

__version__ = "0.1.0"

from incubator_hugegraph_computer_spark.graph import Graph  # noqa: F401
