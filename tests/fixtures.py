"""Deterministic reference-shaped event fixtures (FIXTURES.md §B),
generated under a temp dir. Seed 42 throughout.

Each builder mirrors the encoding quirks of one reference ingest path:
B1 mailgun double-encoded NDJSON (+ name collision + schema drift),
B2 iterable NDJSON (nullable keys, ISO offsets), B3 mongo parquet with
embedded JSON strings (+ `$` names, epoch ms), B4 kafka envelope dumps
(+ duplicate timelines with an exact-timestamp tie), B5 single
multi-line JSON document.
"""

from __future__ import annotations

import json
import os
import random

import pandas as pd

# neutral fixture tags — the reference's production tag strings are
# deployment config, passed explicitly to import_mailgun_events
RELEVANT_TAGS = [
    "example.notification.payment.OnSchedule",
    "example.notification.PaidOff",
    "example.notification.Agreement.TAB",
]
OTHER_TAGS = ["marketing.weekly", "ops.digest", "misc"]

RELEVANT_TYPES = ["PURCHASE_CONFIRMATION", "PAYMENT_REMINDER", "AGREEMENT_TAB"]
OTHER_TYPES = ["LOGIN_ALERT", "NEWSLETTER"]


def build_mailgun(root: str, n_partitions: int = 3, files_per_partition: int = 2,
                  rows_per_file: int = 25) -> str:
    rng = random.Random(42)
    base = os.path.join(root, "mailgun.delivered")
    n = 0
    for p in range(n_partitions):
        d = os.path.join(base, f"partition={p}")
        os.makedirs(d, exist_ok=True)
        for fidx in range(files_per_partition):
            drift = rng.random() < 0.2  # ~20% of files missing campaigns/flags
            lines = []
            for _ in range(rows_per_file):
                n += 1
                tags = rng.sample(RELEVANT_TAGS + OTHER_TAGS, k=rng.randint(0, 3))
                ev = {
                    "timestamp": 1640995200.0 + n * 3600.5,  # epoch seconds, float
                    "event": "delivered",
                    "recipient": f"user{n}@example.com",
                    "tags": tags,
                    "size": 100 + n,  # top-level collision with message.size
                    "delivery-status": {
                        "code": 250,
                        "message": "OK",
                        "attempt-no": rng.randint(1, 3),
                    },
                    "message": {
                        "headers": {
                            "to": f"user{n}@example.com",
                            "message-id": f"<{n}@mg>",
                            "subject": f"hello {n}",
                        },
                        "size": 1000 + n,
                    },
                    "storage": {} if rng.random() < 0.3 else {"url": f"s3://x/{n}"},
                    "envelope": {"sender": "mg@x.com"},
                    "attachments": [],
                }
                if not drift:
                    ev["campaigns"] = []
                    ev["flags"] = {"is-test-mode": False}
                # double encoding: the line is a JSON *string* of the event JSON
                lines.append(json.dumps(json.dumps(ev)))
            with open(os.path.join(d, f"mailgun_{p}_{fidx}.json"), "w") as fh:
                fh.write("\n".join(lines) + "\n")  # trailing newline, like the dumps
    return base


def build_iterable(root: str, n_files: int = 4, rows_per_file: int = 30) -> str:
    rng = random.Random(42)
    base = os.path.join(root, "iterable.events")
    n = 0
    for fidx in range(n_files):
        d = os.path.join(base, f"partition={fidx + 3}")
        os.makedirs(d, exist_ok=True)
        has_profile = rng.random() < 0.6
        lines = []
        for _ in range(rows_per_file):
            n += 1
            ev = {
                "userId": None if rng.random() < 0.05 else str(1000 + n),
                "createdAt": f"2022-01-{(n % 27) + 1:02d}T10:30:00+02:00",
                "eventName": rng.choice(["emailSend", "emailOpen", "emailClick"]),
                "dataFields": {
                    "email": f"u{n}@example.com",
                    "campaignId": rng.randint(1, 9),
                    "templateId": rng.randint(100, 105),
                },
                "labels": [],
                "messageTypeIds": [rng.randint(1, 5)],
                "transactionalData": None,
            }
            if has_profile:
                ev["profileUpdatedAt"] = "2022-01-01T00:00:00+00:00"
            lines.append(json.dumps(ev))
        with open(os.path.join(d, f"events_{fidx}.json"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    return base


def build_mongo(root: str, n_files: int = 3, rows_per_file: int = 40) -> str:
    rng = random.Random(42)
    base = os.path.join(root, "mongo_notifications")
    os.makedirs(base, exist_ok=True)
    n = 0
    for fidx in range(n_files):
        rows = []
        for _ in range(rows_per_file):
            n += 1
            ntype = (
                rng.choice(RELEVANT_TYPES)
                if rng.random() < 0.4
                else rng.choice(OTHER_TYPES)
            )
            doc = {
                "notificationData": json.dumps(
                    {"notificationType": ntype, "channel": "EMAIL"}
                ),
                "localDateTime": {"$date": 1640995200000 + n * 3600000},
                "recipient": {"userId": 5000 + n, "channel": "EMAIL"},
                "notificationPartList": [{"part": 1}],
                "creationDate": f"2022-01-{(n % 27) + 1:02d}T08:00:00Z",
            }
            rows.append({"_id": f"oid{n}", "_doc": json.dumps(doc)})
        pd.DataFrame(rows).to_parquet(
            os.path.join(base, f"20220101_{fidx}.parquet"), index=False
        )
    return base


def build_kafka(root: str) -> dict[str, str]:
    rng = random.Random(42)
    base = os.path.join(root, "card_topics")
    os.makedirs(base, exist_ok=True)
    statuses = ["INITIAL", "DEPRECATED", "STARTED", "COMPLETED", "APPROVED", "DECLINED"]
    lines = []
    offset = 0
    for app_id in range(100, 140):
        for status in rng.sample(statuses, k=rng.randint(1, 4)):
            n_dups = rng.randint(2, 4) if rng.random() < 0.3 else 1
            ts0 = 1641000000000 + app_id * 1000
            for d in range(n_dups):
                offset += 1
                # one exact-timestamp tie pair for determinism testing
                ts = ts0 if (app_id == 101 and d < 2) else ts0 + d * 777
                lines.append(
                    json.dumps(
                        {
                            "topic": "card.applications",
                            "partition": app_id % 3,
                            "offset": offset,
                            "key": str(app_id),
                            "value": {
                                "cardApplicationId": app_id,
                                "applicationStatus": status,
                                "timestamp": ts,
                                "customerId": 7000 + (app_id % 20),
                                "leadId": None if rng.random() < 0.3 else app_id * 2,
                                "payload_rev": d,
                            },
                        }
                    )
                )
    paths = {}
    p = os.path.join(base, "card.applications.json")
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    paths["applications"] = p

    inv_lines = []
    for inv_id in range(500, 540):
        inv_lines.append(
            json.dumps(
                {
                    "topic": "card.application.invitation",
                    "partition": 0,
                    "offset": inv_id,
                    "key": str(inv_id),
                    "value": {
                        "invitationId": inv_id,
                        "customerId": 7000 + (inv_id % 20),
                        "invitationDate": 1640900000000 + inv_id * 500000,
                        "campaignId": inv_id % 5,
                        "workflowId": inv_id % 3,
                    },
                }
            )
        )
    p = os.path.join(base, "card.application.invitation.json")
    with open(p, "w") as fh:
        fh.write("\n".join(inv_lines) + "\n")
    paths["invitations"] = p

    el_lines = []
    for cust in range(7000, 7020):
        el_lines.append(
            json.dumps(
                {
                    "topic": "card.eligible.customer.application.card",
                    "partition": 0,
                    "offset": cust,
                    "key": str(cust),
                    "value": {
                        "customerId": cust,
                        "eligibilityStartDate": 1640000000000 + cust,
                        "entitlement": rng.random() < 0.8,
                    },
                }
            )
        )
    p = os.path.join(base, "card.eligible.customer.application.card.json")
    with open(p, "w") as fh:
        fh.write("\n".join(el_lines) + "\n")
    paths["eligible"] = p
    return paths


def build_colors(root: str) -> str:
    """B5: one multi-line JSON document (`s3_to_silver.py:101-112`)."""
    doc = {
        "colors": [
            {
                "color": c,
                "category": cat,
                "type": t,
                "code": {"rgba": rgba, "hex": hx},
            }
            for c, cat, t, rgba, hx in [
                ("black", "hue", "primary", [255, 255, 255, 1], "#000"),
                ("white", "value", None, [0, 0, 0, 1], "#FFF"),
                ("red", "hue", "primary", [255, 0, 0, 1], "#FF0"),
                ("blue", "hue", "primary", [0, 0, 255, 1], "#00F"),
                ("yellow", "hue", "primary", [255, 255, 0, 1], "#FF00"),
            ]
        ]
    }
    p = os.path.join(root, "colors.json")
    with open(p, "w") as fh:
        json.dump(doc, fh, indent=2)
    return p
