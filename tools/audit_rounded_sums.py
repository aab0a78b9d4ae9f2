import sys
sys.path.insert(0, "/root/repo")
from coffea_spark.queries import REGISTRY
from coffea_spark.session import get_spark
spark = get_spark(app_name="sumaudit", cpus=8, driver_memory="8g")
sf = "/root/testdata/sf0.01"
risky = []
for name, q in REGISTRY.items():
    if q.oracle is None:
        continue
    try:
        rows = q.fn(spark, sf).collect()
    except Exception as e:
        print(name, "ERR", str(e)[:60]); continue
    worst = 0.0
    for r in rows:
        for v in r:
            if isinstance(v, float) and abs(v) > worst:
                worst = abs(v)
    # double ULP at this magnitude vs a 2-decimal rounding quantum:
    # flag when quantum/ULP < 1e4 (the hist3d failure class)
    ulp = worst * 2.2e-16
    if ulp > 0 and 0.01 / ulp < 1e4:
        risky.append((name, worst, 0.01 / ulp))
        print(f"RISKY {name}: max |double| = {worst:.3e}, quantum/ULP = {0.01/ulp:.0f}")
print("audit done; risky:", [r[0] for r in risky])
