"""End-to-end hosted-workspace workflow, runnable fully offline.

Demonstrates the cloud management surface over the in-memory fake
transport — the exact same object model runs against the real API by
swapping the transport (or using ``CloudWorkspace.from_env()`` with
``AIRBYTE_CLOUD_WORKSPACE_ID`` + ``AIRBYTE_CLOUD_API_KEY`` set):

1. publish a custom declarative source definition,
2. deploy a source instance of it + a warehouse destination,
3. connect them and trigger a sync,
4. poll the job and open the synced data as datasets,
5. tear everything down (safe-mode naming).

Run: ``python examples/cloud_workflow.py``
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyairbyte_spark import SparkCache, get_spark  # noqa: E402
from pyairbyte_spark.cloud import CloudWorkspace, FakeCloudTransport
from pyairbyte_spark.sources.declarative import DeclarativeSource

MANIFEST = {
    "name": "source-colors",
    "version": "1.0.0",
    "streams": [
        {
            "name": "colors",
            "primary_key": ["id"],
            "source": {
                "type": "inline",
                "records": [
                    {"id": 1, "color": "red"},
                    {"id": 2, "color": "green"},
                    {"id": 3, "color": "blue"},
                ],
            },
        }
    ],
}


def main() -> None:
    transport = FakeCloudTransport()
    workspace = CloudWorkspace(workspace_id="ws-demo", transport=transport)

    # 1. Publish the declarative definition (pre-validated client-side).
    definition = workspace.publish_custom_source_definition(
        "deleteme colors", manifest_yaml=MANIFEST
    )
    print(f"published definition {definition.definition_id} v{definition.version}")

    # 2. Deploy a source instance + a warehouse destination.
    warehouse_dir = tempfile.mkdtemp(prefix="cloud-demo-wh-")
    source = definition.deploy_source("deleteme colors source")
    destination = workspace.deploy_destination(
        "deleteme warehouse",
        {"destinationType": "spark", "warehouse_dir": warehouse_dir},
    )
    print(f"deployed {source.connector_id} -> {destination.connector_id}")
    print(f"source check: {source.check()}")

    # 3. Connect and trigger a sync.
    connection = workspace.deploy_connection(
        "deleteme colors conn",
        source=source,
        destination=destination,
        selected_streams=["colors"],
    )
    result = connection.run_sync()
    print(f"job {result.job_id} started: {result.get_job_status()}")

    # The fake transport doesn't run a real pipeline — play the sync
    # locally with the SAME manifest the workspace stores, landing data
    # where the destination config points. Against the real API this
    # block is just `result.wait_for_completion()`.
    spark = get_spark("cloud-workflow-demo")
    cache = SparkCache(spark, warehouse_dir)
    DeclarativeSource(definition.manifest).read(cache, write_strategy="auto")
    transport.jobs[result.job_id].update(status="succeeded", rowsSynced=3)

    # 4. Poll + open the synced stream as a dataset.
    print(f"job finished: {result.wait_for_completion()}")
    dataset = result.get_dataset("colors")
    print(f"synced rows: {len(dataset)} -> {sorted(r['color'] for r in dataset)}")

    # 5. Tear down (names carry 'deleteme', so safe mode allows it).
    workspace.permanently_delete_connection(
        connection, cascade_delete_source=True, cascade_delete_destination=True
    )
    definition.permanently_delete()
    print("cleaned up:", len(workspace.list_connections()), "connections left")


if __name__ == "__main__":
    main()
