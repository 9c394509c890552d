"""time conversion constants (noleap calendar)"""

sec_per_day = 86400.0
day_per_year = 365.0
sec_per_year = sec_per_day * day_per_year

day_per_sec = 1.0 / sec_per_day
year_per_sec = 1.0 / sec_per_year
