"""Synthetic flights-itineraries fixture (FIXTURES.md spec B).

Raw Kaggle-shaped table: ``segments*`` columns are ``||``-joined strings
with the reference's quirks -- string-encoded 'None'/'null' elements,
whole-column NULLs, padded codes, malformed durations, quality-filter
violations. Deterministic (numpy RandomState).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

AIRPORTS = [
    "ATL", "BOS", "CLT", "DEN", "DFW", "DTW", "EWR", "IAD",
    "JFK", "LAX", "LGA", "MIA", "OAK", "ORD", "PHL", "SFO",
]
AIRLINES = [
    ("AA", "American Airlines"),
    ("DL", "Delta Air Lines"),
    ("UA", "United Airlines"),
    ("B6", "JetBlue Airways"),
    ("NK", "Spirit Airlines"),
    ("F9", "Frontier Airlines"),
    ("AS", "Alaska Airlines"),
    ("WN", "Southwest Airlines"),
]
CABINS = ["coach", "premium coach", "business", "first"]
EQUIPMENT = ["Boeing 737-800", "Airbus A321", "Embraer 175", "Airbus A320", ""]


def make_flights(n: int = 2000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    base_search = dt.date(2022, 4, 16)

    rows = []
    for i in range(n):
        search = base_search + dt.timedelta(days=int(rng.randint(0, 172)))
        flight = search + dt.timedelta(days=int(rng.randint(0, 61)))
        n_seg = int(rng.choice([1, 1, 1, 2, 2, 3, 4]))

        # leg-consistent airport chain
        chain = list(rng.choice(len(AIRPORTS), size=n_seg + 1, replace=False))
        dep_airports = [AIRPORTS[c] for c in chain[:-1]]
        arr_airports = [AIRPORTS[c] for c in chain[1:]]

        pad = "  " if rng.rand() < 0.05 else ""
        starting = pad + dep_airports[0] + pad
        destination = arr_airports[-1]

        # ~30% mixed-airline multi-leg itineraries
        if n_seg > 1 and rng.rand() < 0.30:
            airline_idx = rng.choice(len(AIRLINES), size=n_seg, replace=True)
        else:
            airline_idx = [rng.randint(0, len(AIRLINES))] * n_seg
        codes = [AIRLINES[a][0] for a in airline_idx]
        names = [AIRLINES[a][1] for a in airline_idx]

        h, m = int(rng.randint(0, 14)), int(rng.randint(0, 60))
        r = rng.rand()
        if r < 0.01:
            duration = "garbage-duration"
        elif r < 0.05:
            duration = f"PT{h}H"
        elif r < 0.09:
            duration = f"PT{m}M"
        else:
            duration = f"PT{h}H{m}M"

        base_fare = round(float(rng.uniform(20, 4000)), 2)
        if rng.rand() < 0.02:  # quality violation: base > total
            total_fare = round(base_fare - 10.0, 2)
        else:
            total_fare = round(base_fare + float(rng.uniform(0, 400)), 2)
        seats = int(rng.randint(-1, 11)) if rng.rand() < 0.02 else int(rng.randint(0, 11))

        dep_times, arr_times = [], []
        t0 = dt.datetime(
            flight.year, flight.month, flight.day, int(rng.randint(5, 20)), 0, 0
        )
        for s in range(n_seg):
            dep = t0 + dt.timedelta(hours=3 * s)
            arr = dep + dt.timedelta(minutes=int(rng.randint(45, 240)))
            if rng.rand() < 0.2:
                dep_times.append(dep.strftime("%Y-%m-%dT%H:%M:%S") + "-04:00")
            else:
                dep_times.append(dep.strftime("%Y-%m-%dT%H:%M:%SZ"))
            arr_times.append(arr.strftime("%Y-%m-%dT%H:%M:%SZ"))

        def int_list(lo: int, hi: int) -> str:
            vals = []
            for _ in range(n_seg):
                rr = rng.rand()
                if rr < 0.03:
                    vals.append("None")
                elif rr < 0.05:
                    vals.append("null")
                else:
                    vals.append(str(int(rng.randint(lo, hi))))
            return "||".join(vals)

        durations = int_list(2700, 14400)
        distances = int_list(100, 2900)
        if rng.rand() < 0.02:  # whole-column NULL -> empty array in silver
            durations = None
            distances = None

        rows.append(
            {
                "index": i,
                "legId": f"{rng.randint(0, 2**31):08x}",
                "searchDate": search.isoformat(),
                "flightDate": flight.isoformat(),
                "startingAirport": starting,
                "destinationAirport": destination,
                "fareBasisCode": f"FB{rng.randint(0, 50):02d}" + ("  " if rng.rand() < 0.1 else ""),
                "travelDuration": duration,
                "elapsedDays": int((flight - search).days),
                "isBasicEconomy": bool(rng.rand() < 0.3),
                "isRefundable": bool(rng.rand() < 0.1),
                "isNonStop": n_seg == 1,
                "baseFare": base_fare,
                "totalFare": total_fare,
                "seatsRemaining": seats,
                "totalTravelDistance": (
                    None if rng.rand() < 0.08 else float(rng.randint(100, 3000))
                ),
                "segmentsDepartureTimeRaw": "||".join(dep_times),
                "segmentsArrivalTimeRaw": "||".join(arr_times),
                "segmentsArrivalAirportCode": "||".join(arr_airports),
                "segmentsDepartureAirportCode": "||".join(dep_airports),
                "segmentsAirlineCode": "||".join(codes),
                "segmentsAirlineName": "||".join(names),
                "segmentsEquipmentDescription": "||".join(
                    EQUIPMENT[rng.randint(0, len(EQUIPMENT))] for _ in range(n_seg)
                ),
                "segmentsCabinCode": "||".join(
                    CABINS[rng.randint(0, len(CABINS))] for _ in range(n_seg)
                ),
                "segmentsDurationInSeconds": durations,
                "segmentsDistance": distances,
            }
        )
    return pd.DataFrame(rows)
