"""Self-contained broker-format fixtures for driver-visible parser
queries.

Original synthetic inputs (NOT the reference's test data) covering
the same edge cases its corpus exercises: dropped non-trade rows,
``£,``-decorated numbers, negative sell quantities, trailing-comma
rows, repeated headers, both deal-time date shapes, and JS number
printing (``40.00`` → ``40``, ``0.050`` → ``0.05``).

EXPECTED_* are the hand-computed canonical lines; the driver oracle
checks parser output against them as literal VALUES, making parser
correctness hash-checkable without reference files.
"""

from __future__ import annotations

from cgtcalc_data_transformer_spark.schemas import FREETRADE_COLUMNS

# ------------------------------------------------------------ freetrade
def _ft_row(**kv: str) -> str:
    return ",".join(kv.get(c, "") for c in FREETRADE_COLUMNS)


FREETRADE_CSV = "\n".join(
    [
        ",".join(FREETRADE_COLUMNS),
        _ft_row(
            Title="Acme Corp",
            Type="ORDER",
            Timestamp="2024-03-07T09:30:00.000Z",
            **{
                "Account Currency": "GBP",
                "Total Amount": "100.00",
                "Buy / Sell": "BUY",
                "Ticker": "ACME",
                "ISIN": "GB0001234567",
                "Price per Share in Account Currency": "2.50",
                "Stamp Duty": "0.50",
                "Quantity": "40.00",
                "FX Fee Amount": "0.25",
            },
        ),
        _ft_row(
            Title="Zed Trust",
            Type="ORDER",
            Timestamp="2024-05-02T16:45:10.123Z",
            **{
                "Buy / Sell": "SELL",
                "Ticker": "ZZT",
                "ISIN": "",
                "Price per Share in Account Currency": "3.00",
                "Stamp Duty": "",
                "Quantity": "1.5",
                "FX Fee Amount": "0.10",
            },
        ),
        _ft_row(Title="Acme Corp", Type="MONTHLY_STATEMENT", Timestamp="2024-06-01T00:00:00.000Z"),
    ]
)

EXPECTED_FREETRADE = [
    "BUY 07/03/2024 GB0001234567 40 2.5 0.75",
    "SELL 02/05/2024 ZZT 1.5 3 0.1",
]

# ------------------------------------------------------------------- ii
II_CSV = "\n".join(
    [
        "Date,Settlement Date,Symbol,Sedol,Quantity,Price,Description,Reference,Debit,Credit,Running Balance",
        '02/01/2024,04/01/2024,TST,B123456,10,£5.25,Buy TST,R1,"£52.50",n/a,"£0.00"',
        '05/01/2024,09/01/2024,QRS,B654321,-2.5,"£1,000.50",Sell QRS,R2,n/a,"£2,501.25","£2,501.25"',
        '10/01/2024,10/01/2024,n/a,n/a,n/a,n/a,Monthly Fee,R3,"£9.99",n/a,"£0.00"',
    ]
)

EXPECTED_II = [
    "BUY 04/01/2024 B123456 10 5.25 0",
    "SELL 09/01/2024 B654321 2.5 1000.5 0",
]

# ------------------------------------------------------------- fidelity
_FID_HEADER = (
    "Order date,Completion date,Transaction type,Investments,Product Wrapper,"
    "Account Number,Source investment,Amount,Quantity,Price per unit,"
    "Reference Number,Status,"
)
FIDELITY_CSV = "\n".join(
    [
        "",  # preamble junk the reader must skip
        "Client account export",
        "",
        "",
        "",
        "",
        "",
        "",
        _FID_HEADER,
        "",
        "2 Feb 2024,5 Feb 2024,Buy,My Test Fund,Investment Account,ZZ00000001,,100.00,25,4.00,R100,Completed,",
        _FID_HEADER,  # repeated header mid-file must be ignored
        "20 Mar 2024,21 Mar 2024,Sell,My Test Fund,Investment Account,ZZ00000001,,-50.00,12.5,4.00,R101,Completed,",
        "1 Apr 2024,2 Apr 2024,Cash In,Cash,Investment Account,ZZ00000001,,500.00,500.00,1,R102,Completed,",
    ]
)
FIDELITY_PREAMBLE_LINES = 8

EXPECTED_FIDELITY = [
    "BUY 05/02/2024 My_Test_Fund 25 4 0",
    "SELL 21/03/2024 My_Test_Fund 12.5 4 0",
]

# --------------------------------------------------------- bullionvault
BULLIONVAULT_EMAILS = [
    (
        "Subject: Dealing advice 555001\n\n<html><body>\n"
        "=09Security: Fine gold kilos in Zurich vault<br>\n"
        "=09Summary: Buy 0.050kg @ GBP 45,000.00/kg\n"
        "=09Deal time: June 3, 2024 at 2:15:30 PM BST\n"
        "=09Consideration: GBP 2,250.00\n"
        "=09Commission: GBP 11.25\n"
        "</body></html>"
    ),
    (
        "Subject: Dealing advice 555002\n\n<html><body>\n"
        "=09Security: Fine silver kilos in London vault<br>\n"
        "=09Deal: Sell 2.5kg @ GBP 640.00/kg\n"
        "=09Deal time: 14 July 2024 09:00:00 BST\n"
        "=09Net consideration: GBP 1,600.00\n"
        "=09Commission: GBP 8.00\n"
        "</body></html>"
    ),
]

EXPECTED_BULLIONVAULT = [
    "BUY 03/06/2024 GOLD 0.05 45000 11.25",
    "SELL 14/07/2024 SILVER 2.5 640 8",
]


def values_oracle(lines: list[str]) -> str:
    """Literal-VALUES oracle for a parser's expected canonical lines."""
    rows = ", ".join("(" + repr(ln).replace('"', "'") + ")" for ln in lines)
    return f"SELECT line FROM (VALUES {rows}) AS t(line)"
