import os

def _maps():
    with open(f"/proc/{os.getpid()}/maps") as f:
        return sum(1 for _ in f)

_last = {"n": 0, "file": None}

def pytest_runtest_logreport(report):
    if report.when != "teardown":
        return
    f = report.nodeid.split("::")[0]
    n = _maps()
    if _last["file"] != f:
        if _last["file"] is not None:
            print(f"\n[MAPS] {_last['file']} -> {n} (+{n - _last['n']})", flush=True)
        _last["file"] = f
        _last["n"] = n
    _last["cur"] = n

def pytest_sessionfinish(session):
    print(f"\n[MAPS] final {_maps()}", flush=True)
