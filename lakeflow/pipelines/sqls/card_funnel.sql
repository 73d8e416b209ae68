-- Gold card-funnel star schema, translated from the reference DDL
-- (/root/reference/card_funnel/sqls/create_customers_table.sql:1-92) to
-- Spark SQL: Redshift identity/PK/FK constraints become documented
-- intent (Spark parquet tables have no enforced constraints; on Delta
-- they map to informational PRIMARY KEY / FOREIGN KEY clauses), and
-- boolean DEFAULT FALSE is applied write-side via coalesce in the
-- populate step.

CREATE DATABASE IF NOT EXISTS {schem};

CREATE TABLE IF NOT EXISTS {schem}.{prefix}customers (
    customer_id            BIGINT NOT NULL,  -- PK (reference :8)
    eligibility_start_date TIMESTAMP,
    entitlement            BOOLEAN,          -- DEFAULT FALSE (:12)
    not_entitlement_reason VARCHAR(50),
    entitlement_date       TIMESTAMP,
    unsubscribe_flag       BOOLEAN,
    unsubscribe_date       TIMESTAMP,
    unsubscribe_reason     VARCHAR(100)
) USING PARQUET;

CREATE TABLE IF NOT EXISTS {schem}.{prefix}invitations (
    invitation_id            BIGINT NOT NULL,  -- PK (:21)
    customer_id              BIGINT,           -- FK -> customers (:36)
    invitation_date          TIMESTAMP,
    campaign_id              INT,
    workflow_id              INT,
    opened_flag              BOOLEAN,
    open_date                TIMESTAMP,
    clicked_flag             BOOLEAN,
    clicked_date             TIMESTAMP,
    last_purchase_date       TIMESTAMP,
    last_purchase_vertical   VARCHAR(50),
    last_purchase_risk_tier  INT
) USING PARQUET;

CREATE TABLE IF NOT EXISTS {schem}.{prefix}applications (
    application_id              BIGINT NOT NULL,  -- PK (:41)
    invitation_id               BIGINT,           -- FK -> invitations (:59)
    customer_id                 BIGINT,           -- FK -> customers (:60)
    application_start_date      TIMESTAMP,
    application_completion_date TIMESTAMP,
    application_status          VARCHAR(100),
    lead_id                     INT,
    application_complete_flag   BOOLEAN,
    monthly_income              DECIMAL(10,2),    -- (:48)
    monthly_housing             DECIMAL(10,2),
    housing_expense_type        VARCHAR(10),
    approval_flag               BOOLEAN,
    approval_date               TIMESTAMP,
    decline_reason              VARCHAR(50),
    offer_flag                  BOOLEAN,
    offer_date                  TIMESTAMP
) USING PARQUET;

CREATE TABLE IF NOT EXISTS {schem}.{prefix}accounts (
    account_id             BIGINT NOT NULL,  -- PK (:64)
    customer_id            BIGINT,           -- FK -> customers (:74)
    application_id         BIGINT,           -- FK -> applications (:75)
    first_activation_flag  BOOLEAN,
    first_activation_date  TIMESTAMP,
    is_first_transaction   BOOLEAN,
    first_transaction_date TIMESTAMP,
    status                 VARCHAR(10)
) USING PARQUET;

CREATE TABLE IF NOT EXISTS {schem}.{prefix}card (
    card_number          BIGINT NOT NULL,  -- PK (:79)
    account_id           BIGINT,           -- FK -> accounts (:91)
    customer_id          BIGINT,           -- FK -> customers (:92)
    sent_flag            BOOLEAN,
    sent_date            TIMESTAMP,
    booked_flag          BOOLEAN,
    booked_date          TIMESTAMP,
    card_activated_flag  BOOLEAN,
    card_activated_date  TIMESTAMP,
    status               VARCHAR(50)
) USING PARQUET;
