"""CAMELS toy-data loader.

Behavior-compatible with the reference ``CAMELSLoader``
(``rrmpg/data/camelsloader.py:14-129``): loads the bundled Daymet forcing
and model-output files of basin 01031500, joins PET and observed discharge,
builds a datetime index and trims to complete hydrological years
(Oct 1 - Sep 30).

CAMELS: Addor, Newman, Mizukami & Clark (2017), doi:10.5065/D6G73C3Q.
"""

from pathlib import Path

import pandas as pd


class CAMELSLoader(object):
    """Interface for loading bundled basins of the CAMELS dataset."""

    VALID_BASINS = ['01031500']

    def __init__(self):
        pass

    def _check_basin(self, basin_number):
        if basin_number not in self.VALID_BASINS:
            raise ValueError(
                f"No bundled data for basin {basin_number!r}; available "
                f"basins: {self.VALID_BASINS}.")

    def _data_dir(self):
        return Path(__file__).parent / 'camels'

    def load_basin(self, basin_number):
        """Load one basin as a pandas DataFrame.

        Args:
            basin_number: string basin id (see :meth:`get_basin_numbers`).

        Returns:
            DataFrame with daily forcing columns, 'PET' and 'QObs(mm/d)',
            indexed by date and trimmed to complete hydrological years.

        Raises:
            ValueError: If the basin number is invalid.
        """
        self._check_basin(basin_number)
        data_dir = self._data_dir()

        met_file = data_dir / f"{basin_number}_lump_cida_forcing_leap.txt"
        streamflow_file = data_dir / f"{basin_number}_05_model_output.txt"

        df = pd.read_csv(met_file, sep=r'\s+', header=3)
        df.index = pd.to_datetime(
            df[['Year', 'Mnth', 'Day']].set_axis(
                ['year', 'month', 'day'], axis=1))

        df2 = pd.read_csv(streamflow_file, sep=r'\s+', header=0)
        df2.index = pd.to_datetime(
            df2[['YR', 'MNTH', 'DY']].set_axis(
                ['year', 'month', 'day'], axis=1))

        df['PET'] = df2['PET']
        df['QObs(mm/d)'] = df2['OBS_RUN']

        df = df.drop(['Year', 'Mnth', 'Day', 'Hr'], axis=1)

        # Trim to complete hydrological years (Oct 1 - Sep 30).
        start_date = pd.to_datetime(f"{df.index[0].year}/10/01",
                                    format="%Y/%m/%d")
        end_date = pd.to_datetime(f"{df.index[-1].year}/09/30",
                                  format="%Y/%m/%d")
        return df[start_date:end_date]

    def get_basin_numbers(self):
        """Return the basin ids bundled with this package."""
        return self.VALID_BASINS

    def get_station_height(self, basin_number):
        """Return the elevation of the meteorological station of one basin.

        Raises:
            ValueError: If the basin number is invalid.
        """
        self._check_basin(basin_number)
        met_file = (self._data_dir() /
                    f"{basin_number}_lump_cida_forcing_leap.txt")
        with open(met_file, 'r') as fp:
            fp.readline()
            height = float(fp.readline().strip())
        return height
