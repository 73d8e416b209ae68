"""Gold layer: card-funnel star schema
(`/root/reference/card_funnel/create_card_funnel_schema.py` + the DDL at
`card_funnel/sqls/create_customers_table.sql`).

The reference only *creates* the schema (population was left to
Redshift-side SQL); here the populate step exists too, as the J2 joins
the FK graph implies (SURVEY §2.5): application events roll up
latest-wins into the applications dimension, joined to customers and
invitations. Booleans get their DEFAULT FALSE write-side
(``coalesce(col, false)`` — reference DDL :12,26,28).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow.operators.dedup import latest_wins
from lakeflow.sinks.tables import run_ddl_script

DDL_PATH = os.path.join(os.path.dirname(__file__), "sqls", "card_funnel.sql")

GOLD_TABLES = ("customers", "invitations", "applications", "accounts", "card")


def create_card_funnel_schema(
    spark: SparkSession, schema: str = "gold", prefix: str = ""
) -> list[str]:
    """K9 templated DDL runner (`create_card_funnel_schema.py:12-21`).
    The (possibly empty) prefix is substituted before the runner's
    identifier check, which an empty string would fail."""
    text = open(DDL_PATH).read().replace("{prefix}", prefix)
    return run_ddl_script(spark, text, schem=schema)


def populate_card_funnel(
    spark: SparkSession,
    applications_events: DataFrame,
    invitations_events: DataFrame,
    eligible_events: DataFrame,
    schema: str = "gold",
    prefix: str = "",
    ts_col: str = "ts",
) -> dict[str, int]:
    """Build the dimensional tables from deduped silver event streams.

    applications_events: (cardapplicationid, applicationstatus,
    timestamp, customerid, leadid) — post kafka import (latest-wins per
    id+status). invitations_events: (invitationid, customerid,
    invitationdate, campaignid, workflowid). eligible_events:
    (customerid, eligibilitystartdate, entitlement).
    """
    counts: dict[str, int] = {}

    customers = (
        latest_wins(eligible_events, ["customerid"], "eligibilitystartdate")
        .select(
            F.col("customerid").alias("customer_id"),
            F.col("eligibilitystartdate").cast("timestamp").alias(
                "eligibility_start_date"
            ),
            F.coalesce(F.col("entitlement"), F.lit(False)).alias("entitlement"),
            F.lit(None).cast("string").alias("not_entitlement_reason"),
            F.lit(None).cast("timestamp").alias("entitlement_date"),
            F.lit(False).alias("unsubscribe_flag"),
            F.lit(None).cast("timestamp").alias("unsubscribe_date"),
            F.lit(None).cast("string").alias("unsubscribe_reason"),
        )
    )
    customers.write.mode("overwrite").insertInto(f"{schema}.{prefix}customers")
    counts["customers"] = spark.table(f"{schema}.{prefix}customers").count()

    invitations = latest_wins(
        invitations_events, ["invitationid"], "invitationdate"
    ).select(
        F.col("invitationid").alias("invitation_id"),
        F.col("customerid").alias("customer_id"),
        F.col("invitationdate").cast("timestamp").alias("invitation_date"),
        F.col("campaignid").cast("int").alias("campaign_id"),
        F.col("workflowid").cast("int").alias("workflow_id"),
        F.lit(False).alias("opened_flag"),
        F.lit(None).cast("timestamp").alias("open_date"),
        F.lit(False).alias("clicked_flag"),
        F.lit(None).cast("timestamp").alias("clicked_date"),
        F.lit(None).cast("timestamp").alias("last_purchase_date"),
        F.lit(None).cast("string").alias("last_purchase_vertical"),
        F.lit(None).cast("int").alias("last_purchase_risk_tier"),
    )
    invitations.write.mode("overwrite").insertInto(
        f"{schema}.{prefix}invitations"
    )
    counts["invitations"] = spark.table(f"{schema}.{prefix}invitations").count()

    # one row per application: the latest status wins; completion/approval
    # dates come from the status timeline (conditional aggregation, no
    # second scan)
    apps = applications_events
    status_ts = apps.groupBy("cardapplicationid").agg(
        F.min(F.when(F.col("applicationstatus") == "STARTED", F.col(ts_col))).alias(
            "application_start_date"
        ),
        F.min(
            F.when(F.col("applicationstatus") == "COMPLETED", F.col(ts_col))
        ).alias("application_completion_date"),
        F.min(F.when(F.col("applicationstatus") == "APPROVED", F.col(ts_col))).alias(
            "approval_date"
        ),
    )
    latest = latest_wins(apps, ["cardapplicationid"], ts_col).select(
        F.col("cardapplicationid").alias("application_id"),
        F.col("customerid").alias("customer_id"),
        F.col("applicationstatus").alias("application_status"),
        F.col("leadid").cast("int").alias("lead_id"),
    )
    applications = (
        latest.join(
            status_ts.withColumnRenamed("cardapplicationid", "application_id"),
            "application_id",
        )
        .select(
            "application_id",
            F.lit(None).cast("long").alias("invitation_id"),
            "customer_id",
            "application_start_date",
            "application_completion_date",
            "application_status",
            "lead_id",
            (F.col("application_completion_date").isNotNull()).alias(
                "application_complete_flag"
            ),
            F.lit(None).cast("decimal(10,2)").alias("monthly_income"),
            F.lit(None).cast("decimal(10,2)").alias("monthly_housing"),
            F.lit(None).cast("string").alias("housing_expense_type"),
            (F.col("approval_date").isNotNull()).alias("approval_flag"),
            "approval_date",
            F.lit(None).cast("string").alias("decline_reason"),
            F.lit(False).alias("offer_flag"),
            F.lit(None).cast("timestamp").alias("offer_date"),
        )
    )
    applications.write.mode("overwrite").insertInto(
        f"{schema}.{prefix}applications"
    )
    counts["applications"] = spark.table(
        f"{schema}.{prefix}applications"
    ).count()
    return counts
