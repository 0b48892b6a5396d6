import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cryptowalletcommunitydetection_spark import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="cwcd-tests", shuffle_partitions=8)
    yield s


# All three reference community-assignment fixtures (schema (index, x, y);
# consumed by the reference at cli/export_transactions.py:22 and clustered
# at services/wallet_clustering.py:51-59) — used read-only as golden input.
REFERENCE_CSVS = {
    "social": "/root/reference/data/social_wallets_pairs.csv",  # 615 pairs
    "0x1": "/root/reference/data/0x1_wallets_pairs.csv",  # 8,659 pairs
    "0x38": "/root/reference/data/0x38_wallets_pairs.csv",  # 23,779 pairs
}


@pytest.fixture(scope="session", params=sorted(REFERENCE_CSVS))
def reference_pairs_pdf(request):
    """Parametrized over every reference fixture: each test consuming this
    fixture runs against all three real workloads."""
    import pandas as pd

    pdf = pd.read_csv(REFERENCE_CSVS[request.param])
    return pdf.rename(columns={"x": "from_address", "y": "to_address"})[
        ["from_address", "to_address"]
    ]
