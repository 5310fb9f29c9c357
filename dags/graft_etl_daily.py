"""Daily batch-ETL DAG (SURVEY §2.9 O3) — the scheduled-orchestration twin
of the reference's `dags/etl_daily.py:11-35` (daily 03:00, no catchup,
fetch >> batch >> dq), re-targeted at the Spark engine in this repo.

Each task is its own `spark-submit` process, so stage isolation and retry
semantics are the scheduler's (stages hand off purely through the bronze /
silver paths on shared storage — see graft.pipeline.Runner). On a real
cluster, swap `--master local[*]` for your YARN/K8s master and point
GRAFT_DATA_DIR / GRAFT_OUT_DIR at distributed storage.

This file is an artifact, not executed in this repo's test environment
(Airflow is not a library dependency of the engine).
"""
from datetime import datetime

from airflow import DAG
from airflow.operators.bash import BashOperator

JAR = "{{ var.value.get('graft_jar', '/opt/graft/graft-assembly.jar') }}"
DATA_DIR = "{{ var.value.get('graft_data_dir', '/data/raw') }}"
OUT_DIR = "{{ var.value.get('graft_out_dir', '/data/graft') }}"
SOURCE_URL = "{{ var.value.get('graft_source_url', 'file:///data/drop/events.parquet') }}"

SPARK_SUBMIT = "spark-submit --master local[*] --class graft.tools.RunPipeline " + JAR

default_args = {
    "retries": 0,
    "depends_on_past": False,
}

with DAG(
    "graft_batch_etl",
    start_date=datetime(2024, 1, 1),
    schedule="0 3 * * *",  # daily 03:00, as the reference schedules it
    catchup=False,
    default_args=default_args,
    tags=["batch", "spark", "graft"],
) as dag:

    # fetch_data.py twin: idempotent download into the raw layer (no Spark)
    fetch = BashOperator(
        task_id="fetch_data",
        bash_command=(
            "spark-submit --master local[1] --class graft.tools.FetchData "
            f"{JAR} {SOURCE_URL} {DATA_DIR}/events.parquet"
        ),
    )

    # batch_etl.py twin: raw -> bronze (partitioned) -> silver (trim/audit)
    batch = BashOperator(
        task_id="spark_batch_etl",
        bash_command=f"{SPARK_SUBMIT} {DATA_DIR} {OUT_DIR} --stage=bronze && "
                     f"{SPARK_SUBMIT} {DATA_DIR} {OUT_DIR} --stage=silver",
    )

    # dq_checks.py twin: single-pass rule counts, JSON artifact, exit-code gate
    dq = BashOperator(
        task_id="dq_checks",
        bash_command=f"{SPARK_SUBMIT} {DATA_DIR} {OUT_DIR} --stage=dq --write-silver",
    )

    fetch >> batch >> dq
