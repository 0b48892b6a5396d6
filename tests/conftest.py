import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cryptowalletcommunitydetection_spark import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="cwcd-tests", shuffle_partitions=8)
    yield s


REFERENCE_CSV = "/root/reference/data/social_wallets_pairs.csv"


@pytest.fixture(scope="session")
def reference_pairs_pdf():
    """The reference's smallest community-assignment fixture (615 wallet
    pairs, schema (index, x, y)) — used read-only as golden input."""
    import pandas as pd

    pdf = pd.read_csv(REFERENCE_CSV)
    return pdf.rename(columns={"x": "from_address", "y": "to_address"})[
        ["from_address", "to_address"]
    ]
