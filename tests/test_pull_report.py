"""pull_report semantics against hand-crafted star-schema rows — each F5-F12
branch from pull_report.pl exercised (FIXTURES.md §B guidance)."""

from __future__ import annotations

from realparse_spark.operators.log_report import pull_report


def test_pull_report_reference_semantics(spark):
    access = spark.createDataFrame(
        [
            (1, "10.0.0.1"),
            (2, "10.0.0.2"),
            (3, "192.168.1.9"),  # F5: internal IP excluded
            (4, "10.0.0.4"),
            (5, "10.0.0.5"),
        ],
        "access_id long, client_ip_address string",
    )
    file = spark.createDataFrame(
        [
            # name, file_time, sent_time, access_id
            ("clip01.rm", 180, 120, 1),
            ("clip01.rm", 180, 200, 2),   # F8: sent > file excluded from time metrics
            ("clip01.rm", 180, 90, 3),    # internal ip row
            ("clip02.rm", 0, 0, 4),       # F7: zero guards
            ("intro.wmv", 300, 60, 5),    # F9: wmv pattern -> N/A
        ],
        "name string, file_time int, sent_time int, access_id long",
    )
    customers = spark.createDataFrame(
        [(100, "Acme", "Yes"), (200, "NoHost", "No")],
        "id long, company_name string, hosting string",
    )
    project = spark.createDataFrame(
        [(7, 100), (8, 200)], "project_id long, customer_id long"
    )
    project_file = spark.createDataFrame(
        [(7, "clip%"), (7, "%.wmv"), (8, "clip%")],
        "project_id long, pattern string",
    )

    rows = {r.pattern: r for r in pull_report(access, file, customers, project, project_file).collect()}

    # hosting='No' customer contributes nothing (F10)
    assert all(r.customer_id == 100 for r in rows.values())

    clip = rows["clip%"]
    # views: clip01 x2 (ids 1,2) + clip02 (id 4); internal-IP row excluded
    assert clip.n_views == 3
    assert clip.clip_length == "3:00"       # max(file_time!=0)=180 -> M:SS
    assert clip.avg_view_time == "2:00"     # only id=1 qualifies (120s)
    assert clip.longest_view_time == "2:00"

    wmv = rows["%.wmv"]
    assert wmv.n_views == 1
    # F9: wmv patterns short-circuit all time metrics to N/A
    assert wmv.clip_length == "N/A"
    assert wmv.avg_view_time == "N/A"
    assert wmv.longest_view_time == "N/A"


def test_pull_report_hour_format(spark):
    access = spark.createDataFrame([(1, "10.0.0.1")], "access_id long, client_ip_address string")
    file = spark.createDataFrame(
        [("show.rm", 7265, 3725, 1)],
        "name string, file_time int, sent_time int, access_id long",
    )
    customers = spark.createDataFrame([(1, "A", "Yes")], "id long, company_name string, hosting string")
    project = spark.createDataFrame([(1, 1)], "project_id long, customer_id long")
    project_file = spark.createDataFrame([(1, "show%")], "project_id long, pattern string")

    r = pull_report(access, file, customers, project, project_file).collect()[0]
    assert r.clip_length == "2:01:05"    # C11 H:MM:SS branch
    assert r.longest_view_time == "1:02:05"
